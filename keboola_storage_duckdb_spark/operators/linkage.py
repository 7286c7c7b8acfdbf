"""Record linkage: edit-distance fuzzy matching without an all-pairs join.

The reference's dedup surface is token/set-based (SURVEY §2.5, §2.14);
this adds the CHARACTER-level near-match family a warehouse needs for
entity resolution — names/SKUs/emails that differ by a typo, which
n-gram Jaccard and MinHash are blind to (one edited character changes
every overlapping shingle).

Candidate generation is the symmetric-delete scheme (SymSpell): each
string maps to itself plus every single-character deletion; two strings
within Levenshtein distance 1 (one substitution, insertion, or deletion)
ALWAYS share a key in their deletion neighbourhoods, so joining on the
neighbourhood is a complete, exact blocking for d=1 — no recall loss,
no N² pair product. Verification is the built-in integer `levenshtein`
(identical classic DP in Spark and DuckDB — the oracle twin is exact).

Scale: the explode is ×(len+1) map-side rows; the join key (a
near-complete string) is highly selective, so candidate groups stay tiny
even at 10⁹ rows — the standard SymSpell trade of memory for the quadratic
scan. Skewed keys (very short strings) would be df-capped the same way
the shingle index caps stop-shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _deletion_neighbourhood(col: str) -> F.Column:
    """Array of the string itself + every single-char deletion (distinct)."""
    return F.array_distinct(F.concat(
        F.array(F.col(col)),
        F.expr(f"transform(sequence(0, length({col}) - 1), "
               f"i -> concat(substring({col}, 1, i), "
               f"substring({col}, i + 2)))")))


def fuzzy_pairs_symdelete(df: DataFrame, id_col: str, name_col: str,
                          max_dist: int = 1,
                          max_variant_freq: int | None = None) -> DataFrame:
    """All pairs (id_a < id_b) whose ``name_col`` values are within
    Levenshtein distance ``max_dist`` (currently 1 — the SymSpell
    1-deletion neighbourhood is complete exactly for d ≤ 1).

    ``max_variant_freq`` (default None = exact): on corpora with
    mass-duplicated names every variant group goes quadratic in the
    duplication factor; a cap drops variant keys shared by more than
    that many rows from candidate generation (deterministic
    sub-recall — pairs sharing only ultra-frequent variants are
    missed; exact duplicates are the exact-dedup pass's job anyway).

    SCALE NOTE (VERDICT r16 #4): the uncapped form collects each
    variant's WHOLE id set into one aggregation buffer and explodes
    v² pairs from that single row — a skew hot-spot when one variant
    is mass-duplicated. The uncapped form is therefore small-data /
    exact-recall only; at scale always pass ``max_variant_freq`` (the
    streaming count cap prunes a hot variant BEFORE its id set ever
    materializes — the form the 10× scale smoke runs).

    Returns (id_a, id_b, name_a, name_b, dist).

    A full DRIVER route was built and A/B-REFUTED in r17 (do not
    re-try): collect names, factorize, SymSpell over unique names,
    chunked-numpy one-edit verify, expand id pairs — rows came out
    identical but the route measured 4.0 s vs 2.8 s distributed in the
    same session. The output itself is ~262 k rows at sf0.1, and the
    driver round-trip (createDataFrame + LocalTableScan collect of the
    result) costs more than the candidate join it replaces; driver
    crossovers only win when the DATA collected and returned is small
    relative to the shuffles they remove (quota/Lloyd/scan cases)."""
    if max_dist != 1:
        raise ValueError("symdelete blocking is complete only for "
                         "max_dist=1; higher radii need d-deletion "
                         "neighbourhoods")
    base = (df.select(F.col(id_col).alias("id"),
                      F.col(name_col).alias("name"))
              .localCheckpoint(eager=False))
    var = base.select(
        "id", F.explode(_deletion_neighbourhood("name")).alias("variant"))
    # Candidate pairs via groupBy + double explode instead of a variant
    # self-join (r16 opt: 2.64 vs 3.32 s calm A/B, rows identical) — one
    # shuffle groups each variant's ids, singleton variants drop before
    # any pair exists, and no 285k-row broadcast hash table is built.
    # (id, variant) pairs are unique (the neighbourhood is per-name
    # distinct), so size(ids) IS the variant frequency the optional cap
    # filters on. Pairs stay bare int ids: names re-attach AFTER dedup
    # via two joins against the tiny base — measured 6.2 → 4.6 s in the
    # build round vs carrying two ~20-char strings through the shuffle.
    if max_variant_freq is not None:
        # cap BEFORE collect_set: the count aggregate streams, so a
        # mass-duplicated variant never materializes its id set at all
        keep = (var.groupBy("variant")
                .agg(F.count(F.lit(1)).alias("vf"))
                .filter(F.col("vf") <= max_variant_freq)
                .select("variant"))
        var = var.join(keep, "variant")
    grp = (var.groupBy("variant").agg(F.collect_set("id").alias("ids"))
              .filter(F.size("ids") >= 2))
    pairs = (grp.select("ids", F.explode("ids").alias("id_a"))
                .select("id_a", F.explode("ids").alias("id_b"))
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b").distinct())
    na = base.select(F.col("id").alias("id_a"), F.col("name").alias("name_a"))
    nb = base.select(F.col("id").alias("id_b"), F.col("name").alias("name_b"))
    return (pairs.join(na, "id_a").join(nb, "id_b")
             .withColumn("dist", F.levenshtein("name_a", "name_b"))
             .filter(F.col("dist") <= max_dist)
             .select("id_a", "id_b", "name_a", "name_b", "dist"))
