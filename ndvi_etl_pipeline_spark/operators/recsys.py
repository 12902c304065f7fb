"""Recommendation operators: item-item co-occurrence similarity and
rank-1 alternating least squares, expressed as DataFrame plans.

The co-occurrence path is the classic "people who bought X also
bought Y" item-CF (Linden et al. 2003, Amazon item-to-item): baskets
self-joined on the basket key produce co-occurrence counts, and the
cosine normalization co / sqrt(n_i * n_j) turns them into a
similarity. Scale shape: the self-join shuffles on the BASKET key, so
each basket's pairs are generated locally and the pair count is
Σ |basket|² — bounded by capping basket size (the production guard
for power users / spam baskets), never by the corpus size. The
aggregated (i, j) pair relation then shuffles once on the pair key
with map-side partial counts.

The ALS path is the rank-1 special case of the classic ALS
matrix-factorization recommender (Zhou et al. 2008): with scalar
factors the alternating closed form is

    u_i = Σ_j r_ij v_j / (λ + Σ_j v_j²)     (over items i rated)
    v_j = Σ_i r_ij u_i / (λ + Σ_i u_i²)     (over users rating j)

— each half-step is one join of the ratings against a factor
relation plus one groupBy, i.e. two bounded shuffles per round with
the ratings relation partitioned once and reused (the pagerank /
Lloyd discipline from operators/graph.py / clustering.py). Factor
state is rounded to 6 decimals every half-step so a DuckDB oracle
replaying the same trajectory stays bit-identical (the
_kmeans_chain discipline in plans/catalog/_shared.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .iterate import materialize

__all__ = ["basket_pairs", "item_similarity", "user_item_scores", "rank1_als"]


def basket_pairs(
    baskets: DataFrame,
    basket_col: str = "basket",
    item_col: str = "item",
    min_co: int = 1,
    max_basket: int = 64,
    focus_items: DataFrame | None = None,
    focus_strategy: str = "join",
) -> DataFrame:
    """Unordered within-basket item pairs (i < j) with co-occurrence
    counts (i, j, co) — the shared candidate-generation stage of
    item-CF and the co-purchase graph. Graph consumers
    (bfs_hops_copurchase) use it directly: going through
    item_similarity would pay two freq joins Catalyst cannot prune,
    since inner joins change cardinality.

    `baskets` holds (basket, item) membership rows (duplicates
    allowed; they are collapsed). Baskets larger than `max_basket`
    items are dropped whole — the quadratic pair-blowup guard (a
    single degenerate basket of 10k items would emit 5·10⁷ pairs;
    real item-CF deployments cap or sample exactly this way).

    One shuffle on the basket key builds the item-set array; pair
    generation is then a JVM-side nested-transform over the sorted
    array (codegen, no self-join, no second scan of the membership
    relation — a basket-keyed self-join computes the same pairs but
    shuffles the membership relation twice).
    """
    arrs = _basket_arrays(baskets, basket_col, item_col).where(
        F.size("items") <= max_basket
    )
    if focus_items is not None and focus_strategy != "array":
        # Basket-level semi-join guard BEFORE pair explosion (the
        # guide's "pre-filter the big side with a semi-join when
        # selective"): a pair can touch a focus item only if its
        # basket CONTAINS a focus item, so baskets disjoint from the
        # focus set need never explode at all. The membership
        # relation semi-joins the broadcast focus set (one codegen
        # probe pass, no shuffle of the corpus), the matching basket
        # ids collapse to a small distinct set, and `arrs` — already
        # hash-partitioned on basket by its own aggregation —
        # semi-joins that set without re-exchanging. Retained-pair
        # counts are untouched: the post-explode focus filter below
        # still drops non-focus-touching pairs WITHIN surviving
        # baskets. At sf10 (itemcf_user_recs: 20 users' histories
        # live in one key universe of 100) this kills ~99% of the
        # 15 M baskets before the quadratic explode.
        fset = F.broadcast(
            focus_items.select(
                F.col(focus_items.columns[0]).alias("item")
            ).distinct()
        )
        hit_baskets = (
            baskets.select(
                F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
            )
            .join(fset, "item", "semi")
            .select("basket")
            .distinct()
        )
        arrs = arrs.join(hit_baskets, "basket", "semi")
    if focus_items is not None and focus_strategy == "array":
        # Push the caller's item restriction into the ARRAY, before
        # pair explosion: intersect each basket with the broadcast
        # focus set, drop zero-hit baskets entirely, and generate
        # only (hit × member) pairs — |hits|·|B| structs per basket
        # instead of |B|²/2, and most baskets never reach the
        # explode at all (itemcf_similar_parts: 10 hot items kill
        # ~all baskets up front; sf10 warm 30.6 s → 17.1 s). Each
        # retained unordered pair is emitted exactly once: for x in
        # hits, keep y when x < y, or when x > y and y is NOT itself
        # a hit (the both-hot pair is emitted only from its smaller
        # endpoint). Pair counts for retained pairs are unchanged vs
        # the unrestricted plan. Right ONLY for small focus sets:
        # the per-basket intersect/contains work scales with
        # |focus|, so a thousands-item focus (itemcf_user_recs'
        # user histories) measured 34% SLOWER this way — large
        # focus sets take the post-explode join path below.
        foc = F.broadcast(
            focus_items.select(
                F.col(focus_items.columns[0]).alias("_f")
            )
            .distinct()
            .agg(F.array_sort(F.collect_set("_f")).alias("_focus"))
        )
        arrs = (
            arrs.join(foc)
            .withColumn("hits", F.array_intersect("items", "_focus"))
            .where(F.size("hits") > 0)
        )
        pair_col = F.flatten(
            F.transform(
                "hits",
                lambda x: F.transform(
                    F.filter(
                        F.col("items"),
                        lambda y: (y != x)
                        & ((x < y) | ~F.array_contains(F.col("hits"), y)),
                    ),
                    lambda y: F.struct(
                        F.least(x, y).alias("i"), F.greatest(x, y).alias("j")
                    ),
                ),
            )
        )
    else:
        pair_col = F.flatten(
            F.transform(
                "items",
                lambda x, i: F.transform(
                    F.slice("items", i + 2, F.size("items")),
                    lambda y: F.struct(x.alias("i"), y.alias("j")),
                ),
            )
        )
    raw = arrs.select(F.explode(pair_col).alias("p")).select("p.i", "p.j")
    if focus_items is not None and focus_strategy != "array":
        # Post-explode restriction for LARGE focus sets: most of the
        # pair volume is singleton (i, j) keys the downstream top-k
        # never looks at, so two broadcast left joins + a flag
        # filter shrink the dominant shuffle to pairs touching the
        # focus set. Pair counts for retained pairs are unchanged.
        fi = F.broadcast(
            focus_items.select(
                F.col(focus_items.columns[0]).alias("_fi")
            ).distinct()
        )
        raw = (
            raw.join(
                fi.select(F.col("_fi").alias("i"), F.lit(1).alias("_hi")),
                "i",
                "left",
            )
            .join(
                fi.select(F.col("_fi").alias("j"), F.lit(1).alias("_hj")),
                "j",
                "left",
            )
            .where(F.col("_hi").isNotNull() | F.col("_hj").isNotNull())
            .drop("_hi", "_hj")
        )
    return (
        raw.groupBy("i", "j")
        .agg(F.count("*").cast("bigint").alias("co"))
        .where(F.col("co") >= min_co)
    )


def _basket_arrays(
    baskets: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    return (
        baskets.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .groupBy("basket")
        .agg(F.array_sort(F.collect_set("item")).alias("items"))
    )


def item_similarity(
    baskets: DataFrame,
    basket_col: str = "basket",
    item_col: str = "item",
    min_co: int = 1,
    max_basket: int = 64,
    focus_items: DataFrame | None = None,
    focus_strategy: str = "join",
    freq_join: str = "shuffle",
) -> DataFrame:
    """Item-item cosine similarity from co-occurrence: basket_pairs()
    plus per-item frequencies and cos = co / sqrt(n_i · n_j).
    Returns (i, j, co, n_i, n_j, cos) for pairs with co >= `min_co`.
    The basket-size cap guards PAIR generation only; frequencies
    count the full membership (the oracle's definition).

    freq_join: how the (huge) pair relation acquires n_i / n_j —
      'shuffle'   sort-merge both joins (the pair table re-exchanges
                  on i then on j — safe at any item cardinality);
      'broadcast' hint the ITEM-sized freq relation to both joins:
                  the pair table never re-shuffles after its own
                  aggregation (the catalog dimension is orders of
                  magnitude smaller than the pair/interaction
                  relations — |items| longs broadcast where the pair
                  table would move twice)."""
    if freq_join not in ("shuffle", "broadcast"):
        raise ValueError(f"unknown freq_join {freq_join!r}")
    pairs = basket_pairs(
        baskets, basket_col, item_col, min_co, max_basket, focus_items,
        focus_strategy,
    )
    # freq = per-item distinct-basket count, computed DIRECTLY as a
    # distinct + count rather than re-exploding the basket-array
    # aggregate: only the basket-keyed EXCHANGE is reusable between
    # this and basket_pairs' array build, not the aggregate itself, so
    # the array route re-ran the corpus-wide collect_set (15 M arrays
    # at sf10) just to tear it apart again. The direct form pays one
    # extra map-side-combined shuffle instead — measured faster on the
    # real catalog query (itemcf_user_recs sf10 interleaved A/B: warm
    # min 17.0 -> 14.4 s, every pair of runs in favor) — and callers
    # that already build the same distinct relation (the
    # itemcf_similar_parts hot-items CTE) now share ITS exchange.
    freq = (
        baskets.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
        .groupBy("item")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    fi = freq.select(F.col("item").alias("i"), F.col("n").alias("n_i"))
    fj = freq.select(F.col("item").alias("j"), F.col("n").alias("n_j"))
    if freq_join == "broadcast":
        fi, fj = F.broadcast(fi), F.broadcast(fj)
    return (
        pairs.join(fi, "i")
        .join(fj, "j")
        .withColumn(
            "cos",
            F.col("co") / F.sqrt(F.col("n_i").cast("double") * F.col("n_j")),
        )
    )



def user_item_scores(
    baskets: DataFrame,
    sims: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
) -> DataFrame:
    """Score candidate items per user: sum of similarities between the
    candidate and every item in the user's history, excluding items
    the user already has. `sims` is item_similarity() output (or any
    (i, j, cos) relation over unordered pairs).

    Plan shape: the user history joins the symmetrized similarity
    relation on the history item (shuffle on item id — the similarity
    relation is the small side at real catalog sizes and broadcasts),
    aggregates on (user, candidate), then anti-joins the history to
    drop already-owned items. Symmetrization is ONE Generate over a
    2-struct array, not a self-union: the union's two branches are the
    same plan up to the final projection, so Catalyst re-executes
    everything above the last reusable exchange twice (the final pair
    aggregate and both frequency probes); exploding both orientations
    out of a single computation of `sims` emits the identical row
    multiset in one pipeline.
    """
    hist = (
        baskets.select(F.col(user_col).alias("user"), F.col(item_col).alias("item"))
        .distinct()
    )
    sym = sims.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("i").alias("item"),
                    F.col("j").alias("cand"),
                    F.col("cos").alias("cos"),
                ),
                F.struct(
                    F.col("j").alias("item"),
                    F.col("i").alias("cand"),
                    F.col("cos").alias("cos"),
                ),
            )
        ).alias("p")
    ).select("p.item", "p.cand", "p.cos")
    scored = (
        hist.join(sym, "item")
        .groupBy("user", "cand")
        .agg(F.sum("cos").alias("score"), F.count("*").cast("bigint").alias("n_common"))
    )
    owned = hist.select("user", F.col("item").alias("cand"))
    return scored.join(owned, ["user", "cand"], "left_anti")


def rank1_als(
    ratings: DataFrame,
    rounds: int = 3,
    lam: float = 0.1,
    user_col: str = "user",
    item_col: str = "item",
    rating_col: str = "r",
) -> DataFrame:
    """Rank-1 ALS trajectory: returns one row per round (`step`) with the
    factor-state fingerprints and the training RMSE after that
    round's (u then v) update.

    The ratings relation is materialized once and reused by every
    half-step join; factor relations are |users| / |items| rows, so
    each round moves only factor-sized data (the pagerank messaging
    shape). State is rounded to 6 decimals per half-step for
    cross-engine trajectory replay.
    """
    base = ratings.select(
        F.col(user_col).alias("user"),
        F.col(item_col).alias("item"),
        F.col(rating_col).cast("double").alias("r"),
    )
    # two checkpointed copies, each pre-partitioned on its half-step's
    # join key, so the corpus-sized relation never re-shuffles inside
    # the loop (the pagerank `ed` discipline) — u-steps join on item,
    # v-steps and the rmse pass join on user
    r_item = materialize(base.repartition("item"))
    r_user = materialize(r_item.repartition("user"))
    v0 = r_item.select("item").distinct().withColumn("v", F.lit(1.0))

    def u_step(v: DataFrame) -> DataFrame:
        return (
            r_item.join(v, "item")
            .groupBy("user")
            .agg(
                F.round(
                    F.sum(F.col("r") * F.col("v"))
                    / (F.lit(lam) + F.sum(F.col("v") * F.col("v"))),
                    6,
                ).alias("u")
            )
        )

    def v_step(u: DataFrame) -> DataFrame:
        return (
            r_user.join(u, "user")
            .groupBy("item")
            .agg(
                F.round(
                    F.sum(F.col("r") * F.col("u"))
                    / (F.lit(lam) + F.sum(F.col("u") * F.col("u"))),
                    6,
                ).alias("v")
            )
        )

    rows = []
    v = v0
    for k in range(1, rounds + 1):
        u = materialize(u_step(v))
        v = materialize(v_step(u))
        rmse = (
            r_user.join(u, "user")
            .join(v, "item")
            .agg(
                F.round(
                    F.sqrt(F.avg(F.pow(F.col("r") - F.col("u") * F.col("v"), 2))), 4
                ).alias("rmse")
            )
        )
        err = (
            rmse.crossJoin(u.agg(F.round(F.sum("u"), 4).alias("sum_u")))
            .crossJoin(v.agg(F.round(F.sum("v"), 4).alias("sum_v")))
            .select(F.lit(k).cast("int").alias("step"), "rmse", "sum_u", "sum_v")
        )
        rows.append(err)
    out = rows[0]
    for e in rows[1:]:
        out = out.unionAll(e)
    return out
