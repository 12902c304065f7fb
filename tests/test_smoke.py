from ndvi_etl_pipeline_spark.sources.testdata import TABLES, load_table


def test_session_up(spark):
    assert spark.range(10).count() == 10


def test_all_tables_readable(spark, sf_dir):
    for name in TABLES:
        df = load_table(spark, name, sf_dir)
        assert len(df.columns) > 0
        assert df.limit(1).count() == 1
