"""Driver row for the composed media funnel (engine extension; the
multimodal counterpart of ``corpus_funnel`` — VERDICT r8 task #6
closed by swapping a redundant registry row).

The funnel under test is :func:`..plans.media_prep.prepare_media_corpus`
— quarantine split -> exact (kind, signature) dedup -> per-kind
Hamming-banded near-dup pairs -> connected-components cluster-minimum
endgame -> quarantine re-union — run over a deterministic
bronze-signed frame derived from the ``events`` table (the
streaming-bronze form: ``kind``/``signature`` precomputed, so no
decode; the decode path has its own pytest surface in
``tests/test_media_prep.py`` / ``test_image_dedup.py``).

Frame construction, DuckDB-replicable by design (the bench entry's
``xxhash64`` base has no DuckDB twin, so this row derives the 64-bit
signature with plain BIGINT arithmetic — overflow-free in both
engines, verified bitwise-identical over 10k ids):

- groups of 16 consecutive ids share a base signature
  ``mix(grp * 2654435761)`` where ``mix`` xors the low 30 bits back
  in at bit 33 (spreads ALL eight 8-bit bands — a raw multiplicative
  base leaves the top bands constant and the band equi-join
  degenerates toward all-pairs);
- within a group, ``id % 4`` is xored into the low 2 bits: 4 exact
  copies of each of 4 near-variants, every variant pair within
  Hamming 2 (so each group's surviving reps form one cluster);
- every 97th id is undecodable (NULL signature) -> quarantined and
  re-unioned per the keep policy;
- kind cycles image/audio/video per group (near-dup banding must
  never cross kinds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_tables


def media_bronze_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic bronze-signed media frame over ``events``."""
    ev = load_tables(spark, sf_dir, register_views=False)["events"]
    grp = F.expr("event_id div 16")
    low = grp * F.lit(2654435761)
    base = low.bitwiseXOR(F.shiftleft(F.pmod(low, F.lit(1073741824)), 33))
    return ev.select(
        F.col("event_id").alias("media_id"),
        F.lit(None).cast("binary").alias("content"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(grp, F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.when(F.col("event_id") % 97 == 0, F.lit(None).cast("long"))
        .otherwise(base.bitwiseXOR(F.pmod(F.col("event_id"), F.lit(4))))
        .alias("signature"),
    )


def q_media_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..plans.media_prep import prepare_media_corpus

    # single pass straight to the driver's comparison: release the
    # returned persist per the documented lifetime contract
    out = prepare_media_corpus(media_bronze_frame(spark, sf_dir), max_hamming=2)
    return out.unpersist().select("media_id", "kind", "signature")


# stage-for-stage DuckDB mirror: frame -> exact dedup (min id per
# (kind, signature)) -> per-kind Hamming<=2 pairs (bit_count(xor)) ->
# recursive min-label closure (the minhash oracle's CC pattern) ->
# drop non-representatives -> re-union the NULL-signature quarantine.
# MATERIALIZED: DuckDB inlines CTEs, and `exact` is referenced three
# times (verify-skill note).
ORACLE_MEDIA_FUNNEL = """
WITH RECURSIVE
frame AS MATERIALIZED (
  SELECT event_id AS media_id,
         ['image','audio','video'][CAST((event_id // 16) % 3 + 1 AS INT)] AS kind,
         CASE WHEN event_id % 97 = 0 THEN NULL
              ELSE xor(
                     xor((event_id // 16) * 2654435761,
                         (((event_id // 16) * 2654435761) % 1073741824) << 33),
                     event_id % 4) END AS signature
  FROM events
),
exact AS MATERIALIZED (
  SELECT media_id, kind, signature FROM (
    SELECT media_id, kind, signature,
           row_number() OVER (
             PARTITION BY kind, signature ORDER BY media_id ASC
           ) AS rn
    FROM frame WHERE signature IS NOT NULL
  ) WHERE rn = 1
),
pairs AS MATERIALIZED (
  SELECT a.media_id AS id_a, b.media_id AS id_b
  FROM exact a JOIN exact b
    ON a.kind = b.kind AND a.media_id < b.media_id
   AND bit_count(xor(a.signature, b.signature)) <= 2
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach(node, lab) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b
),
comp AS (SELECT node, MIN(lab) AS cluster_rep FROM reach GROUP BY node)
SELECT media_id, kind, signature FROM exact
WHERE media_id NOT IN (SELECT node FROM comp WHERE node <> cluster_rep)
UNION ALL
SELECT media_id, kind, signature FROM frame WHERE signature IS NULL
"""


QUERIES = {
    "media_funnel": (q_media_funnel, ORACLE_MEDIA_FUNNEL),
}
