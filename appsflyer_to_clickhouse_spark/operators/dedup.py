"""Deduplication operators (SURVEY.md §2 Part C rows 1-2 + the
training-data near-dup family).

These are the fix for the reference's within-batch-duplicates quirk
(reference main.py:179-180 anti-joins against the *sink* but lets two
same-ID rows in one batch both insert) and the scale-out near-dup
pipeline a 100 TB training-data build needs.

Shuffle budget at scale (the design constraint for every op here):

- ``dedup_exact`` / ``dedup_first_by_time``: exactly ONE hash shuffle
  on the key (partial aggregation map-side first). No driver state.
- MinHash/SimHash signatures: ZERO shuffle — pure per-row expressions
  (see functions/text.py). The only shuffle in the LSH pipeline is the
  candidate-pair join keyed on (band, bucket-key), whose cardinality is
  #docs x #bands rows — independent of document length.
- Candidate verification (exact Jaccard / cosine) touches only the
  LSH-bucketed pairs, never all pairs: the all-pairs O(n^2) join is
  avoided by construction, which is the entire point at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import (
    SIMHASH_BITS,
    lsh_band_keys,
    minhash_signature,
    shingle_digests,
    simhash60,
    tokens,
    word_shingles,
)
from .sizing import graph_partitions

SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 15 -> 2^15 buckets/band


def dedup_exact(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Exact dedup: full-row when ``subset`` is None (deterministic),
    else keep an arbitrary row per key (prefer ``dedup_first_by_time``
    when the survivor matters). Physical plan: map-side partial
    HashAggregate -> single shuffle on the group key -> final aggregate;
    at 100 TB the partial agg removes most duplicates before the wire."""
    return df.dropDuplicates(subset) if subset else df.dropDuplicates()


def dedup_first_by_time(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Keep the earliest row per key — deterministic dedup (SURVEY.md §2
    Part C row 2). ``tiebreak`` columns break time ties so the survivor
    is unique (required for oracle-exact results). One shuffle on the
    key; rank computed within partitions, no global sort."""
    order = [F.col(time_col).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Append ``shingles`` (distinct word n-grams) and ``sig`` (MinHash
    array<string>) columns. Map-only: staged Projects, no explode, no
    shuffle — signatures for 100 TB of docs cost one pass, with each
    shingle md5-hashed exactly once (the digest stage is its own
    column so the ``num_hashes`` array_min expressions share it instead
    of re-hashing — HOFs are interpreted, no codegen CSE)."""
    sh = word_shingles(tokens(F.col(text_col)), shingle_n)
    return (
        df.withColumn("shingles", sh)
        .withColumn(
            "__digests", shingle_digests(F.col("shingles"), num_hashes // 2)
        )
        .withColumn("sig", minhash_signature(F.col("__digests"), num_hashes))
        .drop("__digests")
    )


def _in_group_pairs(ids: Column) -> Column:
    """All (a, b) pairs with a < b from a sorted id array — pure
    expression. ``ids`` is a materialized column attribute, so the
    nested lambdas only re-read it (cheap), never recompute it."""
    return F.flatten(
        F.transform(
            ids,
            lambda a, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
            ),
        )
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows: int = 2,
) -> DataFrame:
    """MinHash-LSH candidate pairs: docs sharing any band bucket.

    Explodes ``bands`` bucket keys per doc (a bands-x fanout of doc IDs
    only — signatures/text are NOT carried through the shuffle), groups
    by (band, key), and explodes in-group pairs. One aggregation
    instead of a self-join: the signature subplan is computed ONCE (a
    self-join would recompute it on both sides — Spark has no common
    subplan reuse across join inputs). Returns distinct (id_a, id_b),
    id_a < id_b. Skew note: a bucket of k near-identical docs yields
    k^2/2 pairs — bounded by duplicate-group size; collect_set keeps
    only ids, never payloads."""
    groups = _lsh_bucket_groups(sig_df, id_col, bands, rows)
    return (
        groups.select(F.explode(_in_group_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )


def _lsh_bucket_groups(
    sig_df: DataFrame, id_col: str, bands: int, rows: int
) -> DataFrame:
    """(band, bucket, sorted id array) of every band-bucket holding >1
    doc — the shared bucketing stage of the salted and unsalted pair
    generators (and of the skew tests that measure their per-key pair
    counts)."""
    banded = sig_df.select(
        F.col(id_col),
        F.posexplode(lsh_band_keys(F.col("sig"), bands, rows)).alias(
            "band", "bucket"
        ),
    ).filter(F.col("bucket").isNotNull())
    return (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )


def lsh_candidate_pairs_salted(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 4,
    rows: int = 2,
    salt: int = 4,
) -> DataFrame:
    """``lsh_candidate_pairs`` with skew-bounded pair GENERATION — the
    same distinct (id_a, id_b) output, but no single task ever holds a
    whole duplicate group's k^2/2 pair explosion.

    The unsalted form's documented skew: a bucket of k near-identical
    docs yields k^2/2 pairs inside ONE task (`lsh_candidate_pairs`,
    above). Here each bucket's sorted id array is sliced into ``salt``
    contiguous chunks; the salt*(salt+1)/2 chunk-pairs (i <= j) are
    exploded into their own rows and REPARTITIONED on (band, bucket,
    i, j), so each task generates at most (k/salt)^2 pairs — an
    adversarial single-bucket cluster spreads over salt^2/2 tasks
    instead of stalling one. Only ids move: signatures are still
    computed once, payloads never shuffle.

    Chunks are slices of the SORTED array, so for i < j every element
    of chunk i precedes every element of chunk j — cross-chunk pairs
    satisfy id_a < id_b by construction; in-chunk pairs (i == j) use
    the usual triangular expansion."""
    groups = _lsh_bucket_groups(sig_df, id_col, bands, rows)
    cell_rows = _salted_cell_rows(groups, salt)
    ca = F.col("ca")
    cross = F.flatten(
        F.transform(
            ca,
            lambda a: F.transform(
                F.col("cb"),
                lambda b: F.struct(a.alias("id_a"), b.alias("id_b")),
            ),
        )
    )
    pairs = F.when(F.col("i") == F.col("j"), _in_group_pairs(ca)).otherwise(cross)
    return (
        cell_rows.select(F.explode(pairs).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )


def _salted_cell_rows(groups: DataFrame, salt: int) -> DataFrame:
    """Slice each bucket's sorted id array into ``salt`` contiguous
    chunks and explode the salt*(salt+1)/2 chunk-pair CELLS, one row
    per (band, bucket, i, j), repartitioned on that full key — the
    task-distribution unit whose pair count the skew test pins."""
    chunk_len = F.ceil(F.size("ids") / F.lit(salt)).cast("int")

    def chunk(c: int) -> Column:
        return F.slice(F.col("ids"), c * chunk_len + 1, chunk_len)

    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(j).alias("j"),
                chunk(i).alias("ca"),
                chunk(j).alias("cb"),
            )
            for i in range(salt)
            for j in range(i, salt)
        ]
    )
    return (
        groups.select("band", "bucket", F.explode(cells).alias("c"))
        .select("band", "bucket", "c.i", "c.j", "c.ca", "c.cb")
        .filter((F.size("ca") > 0) & (F.size("cb") > 0))
        .repartition("band", "bucket", "i", "j")
    )


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
    algorithm: str = "star",
    stats: dict | None = None,
) -> DataFrame:
    """Connected components over an undirected pair list — the step
    that turns near-dup PAIRS into dedup GROUPS (keep one survivor per
    component). Returns (id, component) where component = min id
    reachable from ``id``.

    Two interchangeable engines behind one interface (VERDICT r5
    task 4):

    - ``algorithm="star"`` (default): alternating large-star /
      small-star edge rewrites — O(log n) rounds regardless of
      component SHAPE, the scale path (a 1M-node path component would
      need 1M min-label rounds but ~20 star rounds).
    - ``algorithm="minlabel"``: min-label propagation — O(component
      diameter) rounds, fine for the dense near-dup clusters LSH
      emits, kept as the differential twin for the star rewrite.

    Both use the exact changed-state convergence check and fail LOUD
    on non-convergence. ``stats`` (optional dict) receives
    ``{"rounds": k}`` for round-count pins."""
    if algorithm == "star":
        return connected_components_star(pairs, max_iter=max_iter, stats=stats)
    if algorithm == "minlabel":
        return connected_components_minlabel(pairs, max_iter=max_iter, stats=stats)
    raise ValueError(f"unknown connected-components algorithm: {algorithm!r}")


def connected_components_minlabel(
    pairs: DataFrame,
    max_iter: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Min-label propagation to fixpoint — each iteration every
    node takes the min of its own label and its neighbors' labels; at
    convergence every node holds the component's global min id.
    Iterations = O(component diameter), which for near-dup clusters is
    tiny (duplicate groups are dense). Each iteration is ONE join + ONE
    groupBy on the edge list; labels are localCheckpoint'ed per
    iteration — without that, iterative lineage doubles per step and
    the job re-executes the whole history (the classic iterative-Spark
    trap). The driver-side loop holds only a changed-row COUNT, never
    data. At 100 TB the same algorithm runs under GraphFrames
    connectedComponents with checkpointing; this form has no extra
    dependency and an exact recursive-CTE oracle."""
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    # size the loop's shuffles to the EDGE LIST, not the session
    # default: the candidate graph is orders of magnitude smaller than
    # the corpus (LSH-bounded), and a fixpoint loop at 32 partitions of
    # a few thousand rows is pure scheduling overhead (measured ~19s ->
    # ~4s at sf0.1). ~100k edges per partition; at 100 TB this sizing
    # rule scales with the graph, which is the actual working set.
    n_edges = sym.count()
    npart = graph_partitions(n_edges)
    sym = sym.repartition(npart, "dst")
    # every shuffle INSIDE the loop (the join, the groupBy, the
    # repartitions) must be graph-sized too: at the session's batch
    # width each iteration schedules 32-partition exchanges over a few
    # thousand rows, and the fixed per-task cost dominates the loop.
    # Scope the conf around the fixpoint; it is restored before return.
    spark = pairs.sparkSession
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(npart))
    try:
        labels = (
            sym.select(F.col("src").alias("id"))
            .distinct()
            .withColumn("label", F.col("id"))
            .repartition(npart, "id")
            .localCheckpoint()
        )
        rounds = 0
        for _ in range(max_iter):
            rounds += 1
            neigh = (
                sym.join(labels, sym.dst == labels.id)
                .groupBy("src")
                .agg(F.min("label").alias("nlabel"))
            )
            # the changed flag rides the checkpointed frame, so the
            # convergence aggregate below scans cached blocks — one
            # cheap agg per iteration, and EXACT for ids of ANY type
            # (the previous sum(label) check was numeric-only: over
            # string ids the sum is NULL and NULL == NULL "converged"
            # after one iteration, silently splitting components)
            least = F.least(
                F.col("label"), F.coalesce("nlabel", F.col("label"))
            )
            staged = (
                labels.join(neigh, labels.id == neigh.src, "left")
                .select(
                    "id",
                    least.alias("label"),
                    (least != F.col("label")).cast("int").alias("_chg"),
                )
                .repartition(npart, "id")
                .localCheckpoint()
            )
            n_changed = staged.agg(F.sum("_chg")).collect()[0][0]
            labels = staged.drop("_chg")
            if not n_changed:
                break
        else:
            # loop exhausted WITHOUT the stationary-sum break: labels
            # are not at fixpoint and returning them would silently
            # split components (dedup would then keep multiple
            # "representatives" of one duplicate group). Fail loud —
            # a component diameter beyond max_iter needs a bigger cap,
            # not wrong answers.
            raise RuntimeError(
                f"connected_components did not converge in {max_iter} "
                "iterations (component diameter exceeds the cap); "
                "raise max_iter"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select(F.col("id"), F.col("label").alias("component"))


def connected_components_star(
    pairs: DataFrame,
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Connected components in O(log n) rounds via alternating
    LARGE-STAR / SMALL-STAR edge rewrites (the MapReduce CC family of
    Kiveris et al., "Connected Components in MapReduce and Beyond" —
    public algorithm; re-expressed here as DataFrame ops). Same output
    contract as min-label propagation: (id, component = min reachable
    id).

    Why it exists: min-label needs O(component DIAMETER) rounds — a
    chain-shaped component of 1M near-dup docs (each doc similar only
    to its neighbors, the classic template-drift shape) would need 1M
    shuffles. The star rewrites contract every component onto its
    minimum id in O(log n) rounds regardless of shape
    (tests/test_connected_components.py pins the round count on a
    path graph).

    Each round is two edge-multiset rewrites, each ONE groupBy (the
    per-node min) + ONE key-partitioned join (re-attach the min to the
    node's edges) — no collect_list, so a hot star center never
    materializes its whole component in one task buffer; the min
    aggregation is map-side partial:

    - large-star(u): m = min(N(u) + {u}); every neighbor v > u
      re-points to m — long tails fold onto small ids in parallel.
    - small-star(u over edges oriented max->min): m = min(N(u) + {u});
      all neighbors and u itself re-point to m — flattens local trees
      into stars.

    Edges stay canonically oriented (u > v) and deduped, so the
    fixpoint test is EXACT set equality (count + exceptAll on
    localCheckpoint'ed frames — the same loud-convergence discipline
    as min-label: a non-converged return would silently split
    components). At fixpoint the edge set is a union of min-rooted
    stars; labels read directly off it."""
    spark = pairs.sparkSession
    raw = pairs.select(
        F.col("id_a").alias("u"), F.col("id_b").alias("v")
    ).filter(F.col("u") != F.col("v"))
    nodes = (
        raw.select(F.col("u").alias("id"))
        .union(raw.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    edges = (
        raw.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
    )
    n_edges = edges.count()
    if n_edges == 0:
        return nodes.withColumn("component", F.col("id"))
    npart = graph_partitions(n_edges)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(npart))
    # one-pass convergence PROBE per round: cardinality + an
    # order-independent exact-sum of xxhash64(u, v) (decimal — ANSI
    # long-sum would overflow-error). Two canonical-distinct edge
    # sets with equal count and equal hash-sum are almost surely
    # equal; the EXACT exceptAll confirmation then runs only on the
    # (usually single) round whose probe matches — replacing a full
    # anti-join shuffle per round with one cheap aggregate. This is
    # the bench-tail fix (VERDICT r8 task 7): the per-round work is
    # one fewer shuffle and the loop's wall spread stops tracking the
    # exceptAll JVM-pause lottery, while convergence stays exact (a
    # probe collision without true equality just costs one harmless
    # extra confirmation).
    def _probe(df):
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(
                F.xxhash64("u", "v").cast("decimal(38,0)")
            ).alias("h"),
        ).first()
        return int(row["n"]), row["h"]

    try:
        edges = edges.repartition(npart, "u").localCheckpoint()
        n_cur, h_cur = _probe(edges)
        rounds = 0
        for _ in range(max_iter):
            rounds += 1
            # ---- large-star: neighbors above u re-point to u's min
            sym = edges.union(
                edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            lmin = (
                sym.groupBy("u")
                .agg(F.min("v").alias("mv"))
                .select("u", F.least("u", "mv").alias("m"))
            )
            large = (
                sym.join(lmin, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
            # large emits (v, m) with m <= u < v: already max->min
            # oriented and self-loop-free. NOT deduped — duplicates
            # cannot change the small-star min and the round's single
            # distinct (below) canonicalizes, so deduping here would
            # buy nothing for one extra full shuffle per round.
            # ---- small-star: u and its below-u neighbors re-point to
            # the min (input is max->min oriented, so the group under
            # u is exactly its below-u neighborhood)
            smin = large.groupBy("u").agg(F.min("v").alias("m"))
            # distinct both canonicalizes the multiset for the exact
            # fixpoint compare AND already lands the frame on npart
            # hash partitions (shuffle.partitions is scoped above), so
            # no extra repartition before the checkpoint
            small = (
                large.join(smin, "u")
                .filter(F.col("v") != F.col("m"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
                .union(smin.select("u", F.col("m").alias("v")))
                .distinct()
                .localCheckpoint()
            )
            # ---- exact fixpoint test over canonical distinct sets
            n_new, h_new = _probe(small)
            converged = (
                n_new == n_cur
                and h_new == h_cur
                and small.exceptAll(edges).isEmpty()
            )
            edges, n_cur, h_cur = small, n_new, h_new
            if converged:
                break
        else:
            raise RuntimeError(
                f"connected_components_star did not converge in "
                f"{max_iter} rounds; raise max_iter"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    if stats is not None:
        stats["rounds"] = rounds
    comp = edges.groupBy("u").agg(F.min("v").alias("component"))
    return (
        nodes.join(comp, nodes["id"] == comp["u"], "left")
        .select(
            nodes["id"].alias("id"),
            F.coalesce(comp["component"], nodes["id"]).alias("component"),
        )
    )


def jaccard_verify(
    pairs: DataFrame,
    sig_df: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
    raw_threshold: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs only (never all pairs):
    join shingle arrays back by id, similarity via array_intersect /
    array_union sizes. Returns (id_a, id_b, jaccard) >= threshold.

    ``raw_threshold=True`` filters on the UNROUNDED ratio and rounds
    only for output. The default (rounded filter) matches the LSH-verify
    oracles; the raw filter is for candidate generators whose
    completeness is proven for exact Jaccard >= t (AllPairs prefix
    filtering) — a rounded filter there would admit a pair with exact
    Jaccard in [t - 5e-7, t) that the candidate proof doesn't cover."""
    sh = sig_df.select(F.col(id_col), F.col("shingles"))
    joined = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
    )
    jac = F.size(F.array_intersect("sh_a", "sh_b")).cast("double") / F.size(
        F.array_union("sh_a", "sh_b")
    ).cast("double")
    if raw_threshold:
        return (
            joined.select("id_a", "id_b", jac.alias("_j"))
            .filter(F.col("_j") >= threshold)
            .select("id_a", "id_b", F.round("_j", 6).alias("jaccard"))
        )
    return (
        joined.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def containment_verify(
    pairs: DataFrame,
    sig_df: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.9,
) -> DataFrame:
    """Exact shingle CONTAINMENT over candidate pairs —
    |A ∩ B| / min(|A|, |B|) — the doc-contains-doc measure Jaccard
    structurally misses: a short document fully embedded in a long one
    has Jaccard ≈ |short|/|long| (arbitrarily low) but containment
    1.0. Broder's resemblance-vs-containment distinction; the standard
    second verify pass of an LLM near-dup pipeline. Same
    candidates-only join shape as ``jaccard_verify`` — never all
    pairs. Returns (id_a, id_b, containment, direction) >= threshold,
    direction naming which side is the contained (smaller) set."""
    sh = sig_df.select(F.col(id_col), F.col("shingles"))
    joined = pairs.join(
        sh.withColumnRenamed(id_col, "id_a").withColumnRenamed(
            "shingles", "sh_a"
        ),
        "id_a",
    ).join(
        sh.withColumnRenamed(id_col, "id_b").withColumnRenamed(
            "shingles", "sh_b"
        ),
        "id_b",
    )
    na, nb = F.size("sh_a"), F.size("sh_b")
    cont = F.size(F.array_intersect("sh_a", "sh_b")).cast(
        "double"
    ) / F.least(na, nb).cast("double")
    return (
        joined.filter((na > 0) & (nb > 0))
        .select(
            "id_a",
            "id_b",
            F.round(cont, 6).alias("containment"),
            F.when(na <= nb, F.lit("a_in_b"))
            .otherwise(F.lit("b_in_a"))
            .alias("direction"),
        )
        .filter(F.col("containment") >= threshold)
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", shingle_n: int = 3
) -> DataFrame:
    """Append a 60-bit ``simhash`` column over distinct word n-grams.
    Map-only, zero shuffle (functions/text.py:simhash60)."""
    return df.withColumn(
        "simhash", simhash60(word_shingles(tokens(F.col(text_col)), shingle_n))
    )


def simhash_near_pairs(
    sim_df: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: band the 60-bit signature into 4 bands
    of 15 bits; by pigeonhole, any pair within hamming distance 3
    shares at least one band — group on (band_idx, band_val), explode
    in-group pairs (signature subplan computed once — see
    lsh_candidate_pairs), then filter exact hamming via bit_count(xor).
    Candidate generation is linear in docs x 4, never all-pairs, and
    bucket cardinality is 4 x 2^15 = 131,072 — corpus-size-independent
    saturation doesn't hit until n >> 10^5 per band value (a byte-banded
    32-bit signature saturates at 1,024 buckets, a quadratic wall at
    100x data)."""
    bands_arr = F.array(
        *[
            F.shiftright(F.col("simhash"), SIMHASH_BAND_BITS * i).bitwiseAND(
                F.lit(2**SIMHASH_BAND_BITS - 1)
            )
            for i in range(SIMHASH_BANDS)
        ]
    )
    banded = sim_df.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(bands_arr).alias("band_idx", "band_val"),
    ).filter(F.col("simhash").isNotNull())
    groups = (
        banded.groupBy("band_idx", "band_val")
        .agg(
            F.sort_array(
                F.collect_set(F.struct(F.col(id_col).alias("id"), "simhash"))
            ).alias("items")
        )
        .filter(F.size("items") > 1)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("items"),
            lambda a, i: F.transform(
                F.slice(F.col("items"), i + 2, F.size(F.col("items"))),
                lambda b: F.struct(
                    a["id"].alias("id_a"),
                    b["id"].alias("id_b"),
                    F.bit_count(a["simhash"].bitwiseXOR(b["simhash"])).alias(
                        "hamming"
                    ),
                ),
            ),
        )
    )
    return (
        groups.select(F.explode(pair_structs).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"), F.col("p.hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def embedding_cosine_pairs(
    emb: DataFrame,
    planes: list[list[int]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "v",
    band_bits: int = 15,
    num_bands: int = 4,
) -> DataFrame:
    """Embedding near-dup pairs, blocked by sign-LSH bands — the scale
    path for cosine dedup (a fixed-cardinality block key like a class
    label caps the bucket count at #labels, so in-block pairs grow
    ~n^2/#labels; a 15-bit sign-LSH band gives 2^15 buckets per band,
    and bucket occupancy — hence pair count — tracks corpus density,
    not a constant).

    Stages: (1) map-only sign signature per vector over SPARSE ternary
    planes (operators/similarity.py:sparse_planes — md5-derived, so the
    oracle embeds the SAME planes; computed by the Arrow-vectorized
    kernel, bit-identical to the oracle's SQL chain); (2) band the
    signature, groupBy (band_idx,
    band_val), explode in-group id pairs — the signature subplan
    computes ONCE (a banded self-join would recompute all the plane
    dots on both sides); (3) join candidate ids back to vectors and
    verify with EXACT cosine >= threshold. Verification touches only
    LSH-colliding pairs, never all pairs. At 100 TB, signatures are
    computed at ingest and stored; recall for near-identical vectors is
    amplified by OR over bands — add bands to raise recall, bits to cut
    candidates."""
    from .similarity import band_values, dot, sparse_sign_signature_udf

    # Arrow-vectorized signatures (bit-identical to the SQL chain the
    # oracle runs — see sparse_sign_signature_udf's tie-rescue note).
    # No projection-collapse barrier needed: ExtractPythonUDFs pulls
    # the UDF into ONE ArrowEvalPython node whose output attribute the
    # per-band projections reference, so the kernel runs once per row
    # even though band_values() mentions the signature num_bands times
    # (plan-pinned in tests/test_plan_shapes.py) — unlike the SQL-
    # expression form this replaced, which CollapseProject inlined
    # into every band element.
    sig = emb.select(
        F.col(id_col),
        sparse_sign_signature_udf(planes)(F.col(vec_col)).alias("s"),
    )
    banded = sig.select(
        F.col(id_col),
        F.posexplode(band_values(F.col("s"), band_bits, num_bands)).alias(
            "band_idx", "band_val"
        ),
    )
    groups = (
        banded.groupBy("band_idx", "band_val")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = (
        groups.select(F.explode(_in_group_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )
    n = emb.select(
        F.col(id_col),
        F.col(vec_col),
        dot(F.col(vec_col), F.col(vec_col)).alias("nn"),
    )
    joined = (
        cand.join(
            n.select(
                F.col(id_col).alias("id_a"),
                F.col(vec_col).alias("va"),
                F.col("nn").alias("nna"),
            ),
            "id_a",
        )
        .join(
            n.select(
                F.col(id_col).alias("id_b"),
                F.col(vec_col).alias("vb"),
                F.col("nn").alias("nnb"),
            ),
            "id_b",
        )
    )
    cos = F.round(
        dot(F.col("va"), F.col("vb")) / (F.sqrt("nna") * F.sqrt("nnb")), 6
    )
    return (
        joined.select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def argmax_case_sql(k: int, prefix: str = "d") -> str:
    """CASE expression choosing the argmax of columns ``d0..d{k-1}``
    with first-match-wins >= comparisons, so ties resolve to the LOWEST
    index in every engine. Shared text between the Spark plan and the
    DuckDB oracle — the assignment cannot drift."""
    whens = []
    for p in range(k - 1):
        rest = [f"{prefix}{q}" for q in range(p + 1, k)]
        cmp = rest[0] if len(rest) == 1 else f"greatest({', '.join(rest)})"
        whens.append(f"WHEN {prefix}{p} >= {cmp} THEN {p}")
    return "CASE " + " ".join(whens) + f" ELSE {k - 1} END"


def semantic_dedup(
    emb: DataFrame,
    protos: list[list[int]],
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space with a coarse quantizer, then inside each cluster
    drop every vector whose exact cosine to ANY lower-id cluster-mate
    reaches ``threshold``; survivors (id, cluster) are the semantically
    deduplicated corpus.

    Published algorithm's scale contract: K (number of clusters) grows
    with the corpus so mean cluster size C stays bounded (the paper
    uses K = 110k for 600M docs, C ~ 5k); the in-cluster pair stage
    then costs O(n * C) — LINEAR in n — never all-pairs. Here K =
    len(protos) is a test-scale constant, and the quantizer is a set
    of md5-derived ternary prototypes (argmax-dot assignment) instead
    of trained k-means centroids, so the DuckDB oracle can reproduce
    the assignment bit-for-bit; the production build swaps in the
    seeded KMeans centroids from operators/ivf.py:build_ivf, stored as
    a partition column at ingest so the pair stage shuffles nothing
    but in-partition ids.

    Drop semantics are monotone (compare against ALL lower-id mates,
    not just surviving ones) — a deliberate, join-expressible
    simplification of the paper's greedy keep-one-per-group, and the
    form every large-scale reimplementation uses.

    Stages: (1) map-only prototype dots + argmax CASE per row (sparse
    ternary dots stay inside whole-stage codegen); (2) groupBy(cluster)
    + in-group pair explosion — ids only, vectors never shuffle twice;
    (3) exact-cosine verify join over candidates; (4) broadcast-size
    anti-join of dropped ids."""
    from .similarity import dot, sparse_dot_sql

    staged = emb.select(
        F.col(id_col),
        F.col(vec_col),
        dot(F.col(vec_col), F.col(vec_col)).alias("nn"),
        *[
            F.expr(sparse_dot_sql(w, vec_col, 0)).alias(f"d{p}")
            for p, w in enumerate(protos)
        ],
    )
    clustered = staged.select(
        F.col(id_col),
        F.col(vec_col),
        F.col("nn"),
        F.expr(argmax_case_sql(len(protos))).alias("cluster"),
    )
    return semantic_prune(clustered, threshold, id_col, vec_col)


def semantic_prune(
    clustered: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """SemDeDup's in-cluster prune, quantizer-agnostic: given
    (id, vec, nn=<v,v>, cluster), drop every vector whose exact cosine
    to any lower-id cluster-mate reaches ``threshold``; return
    surviving (id, cluster). Shared by the md5-prototype exact twin
    (``semantic_dedup``) and the seeded-KMeans production variant
    (plans/mllib_queries.py:dedup_semantic_kmeans) — the paper's scale
    contract lives entirely in this stage: pairs are generated
    per-cluster (O(n * C), never all-pairs), ids-only until the
    verify join pulls vectors back."""
    from .similarity import dot

    groups = (
        clustered.groupBy("cluster")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    cand = (
        groups.select(F.explode(_in_group_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
    )
    n = clustered.select(id_col, vec_col, "nn")
    joined = (
        cand.join(
            n.select(
                F.col(id_col).alias("id_a"),
                F.col(vec_col).alias("va"),
                F.col("nn").alias("nna"),
            ),
            "id_a",
        )
        .join(
            n.select(
                F.col(id_col).alias("id_b"),
                F.col(vec_col).alias("vb"),
                F.col("nn").alias("nnb"),
            ),
            "id_b",
        )
    )
    cos = F.round(
        dot(F.col("va"), F.col("vb")) / (F.sqrt("nna") * F.sqrt("nnb")), 6
    )
    dropped = (
        joined.select("id_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("id_b"))
        .distinct()
    )
    return clustered.select(id_col, "cluster").join(
        dropped, F.col(id_col) == F.col("id_b"), "left_anti"
    )


def prefix_filter_candidates(
    sh_df: DataFrame,
    id_col: str = "doc_id",
    t_num: int = 4,
    t_den: int = 5,
    apply_size_filter: bool = True,
) -> DataFrame:
    """AllPairs/PPJoin prefix-filtering candidate pairs (Bayardo et al.,
    WWW'07): order every doc's shingle set by GLOBAL rarity (document
    frequency asc, shingle asc — a total order, no rank table needed),
    keep only the first ``|S| - ceil(t*|S|) + 1`` shingles (the
    "prefix"), and emit pairs sharing any prefix shingle. Pigeonhole:
    two sets with Jaccard >= t overlap in > |S| - prefix positions of
    ANY shared total order, so true pairs ALWAYS share a prefix shingle
    — the candidate set is provably complete (the oracle's brute-force
    twin checks exactly this).

    Scale shape: one explode bounded by total shingle volume, a
    frequency join AQE sizes itself (the DF table is |vocab| rows —
    broadcast when small, shuffle join when not), one per-doc window,
    then the same groupBy+in-group-pairs bucket explosion as LSH (the
    signature subplan computes once; no self-join). Bucket sizes are
    bounded by the document frequency of RARE shingles — the whole
    point of prefix ordering — so candidates never approach n^2.
    Candidates then pass the AllPairs SIZE filter — J(A,B) >= t
    implies min(|A|,|B|)/max(|A|,|B|) >= t (intersection <= min,
    union >= max), checked as exact integer cross-multiplication —
    before the expensive exact verification; on a template-heavy
    corpus this prunes the bulk of prefix collisions between docs of
    very different lengths while provably dropping no true pair.
    Threshold is exact rational arithmetic (t = t_num/t_den):
    prefix_len = |S| - ceil(t_num*|S| / t_den) + 1, identical integer
    math on both engines."""
    ex = sh_df.select(
        F.col(id_col),
        F.explode("shingles").alias("g"),
        F.size("shingles").alias("sz"),
    )
    freq = ex.groupBy("g").agg(F.count("*").alias("gdf"))
    w = Window.partitionBy(id_col).orderBy("gdf", "g")
    prefix_len = (
        F.col("sz")
        - F.expr(f"({t_num} * sz + {t_den - 1}) DIV {t_den}")
        + F.lit(1)
    )
    pre = (
        ex.join(freq, "g")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= prefix_len)
    )
    groups = (
        pre.groupBy("g")
        .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = (
        groups.select(F.explode(_in_group_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.id_a"), F.col("p.id_b"))
        .distinct()
    )
    if not apply_size_filter:  # the ungated twin, for evidence tests
        return pairs
    sizes = sh_df.select(
        F.col(id_col).alias("_sz_id"), F.size("shingles").alias("_sz")
    )
    # `sizes` is one row per document — corpus-cardinality-sized, so a
    # forced broadcast would pin O(corpus) rows on the driver at scale.
    # Leave the strategy to AQE: it broadcasts when the (2-column,
    # int-typed) side is actually small and falls back to a shuffled
    # join when it is not.
    return (
        pairs.join(
            sizes.select(F.col("_sz_id").alias("id_a"),
                         F.col("_sz").alias("sz_a")),
            "id_a",
        )
        .join(
            sizes.select(F.col("_sz_id").alias("id_b"),
                         F.col("_sz").alias("sz_b")),
            "id_b",
        )
        .filter(
            F.least("sz_a", "sz_b") * t_den
            >= F.greatest("sz_a", "sz_b") * t_num
        )
        .select("id_a", "id_b")
    )
