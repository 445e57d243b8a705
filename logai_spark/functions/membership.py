"""Bloom-filter membership dedup — the Dolma-style scale path for
cross-corpus exact dedup.

At 10^12 documents, the exact "is this doc's content already in corpus B"
check cannot ship corpus B anywhere: a broadcast hash set is O(|B|) driver
memory and a shuffle join re-partitions the full corpus. The production
answer (Dolma's dedupe tool, Bloom 1970) is a Bloom filter: corpus B is
reduced to an m-bit array (m chosen for the target false-positive rate,
~1.2 GiB for 10^9 items at 1% FP), built with ONE partial aggregate, and
probing is a zero-shuffle projection against the broadcast bits.

Spark shape:

- **build**: per ref doc, k = ``n_hashes`` bit positions derived from the
  md5 content hash through the same affine family the MinHash operator
  uses; positions fold into 64-bit words via a map-side-combined
  ``bit_or`` aggregate keyed on word index — the shuffle carries at most
  m/64 rows of (int, long), never text. The dense word table collapses
  into a single map<int,long> row.
- **probe**: the one-row map cross-joins (broadcast) onto the corpus;
  the k membership tests are plain codegen expressions
  (``element_at & bit``) — the corpus is never shuffled and the scan
  stays whole-stage pipelined.

Determinism: every position is md5-derived (identical in DuckDB), so the
whole filter — INCLUDING its false positives — is bit-reproducible across
engines; the driver oracle checks the flags exactly rather than
statistically.

Guarantee: no false negatives (every true member flags), false positives
at the classic (1 - e^{-kn/m})^k rate; callers route "maybe duplicate"
docs to the drop/quarantine side exactly like Dolma's dedupe stage.

Reference surface: this extends the builder brief's training-data-pipeline
dedup family (exact / MinHash-LSH / SimHash / …) with the membership
variant; salesforce/logai has no analog (its dedup is
pandas drop_duplicates in preprocess.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Affine family over the 32-bit md5 hash — same modulus as the MinHash
# permutations (2^31 - 1, prime), coefficients disjoint from theirs so a
# pipeline using both never correlates their buckets.
_P = 2_147_483_647
_A0, _DA = 76_091, 40_961
_B0, _DB = 15_013, 7_993


def _h_sql(text_col: str) -> str:
    """The engine-portable 32-bit content hash as a Spark SQL fragment
    (textops._hash32's formula)."""
    return f"cast(conv(substring(md5(`{text_col}`), 1, 8), 16, 10) as bigint)"


def _positions_sql(h_sql: str, m_bits: int, n_hashes: int) -> list[str]:
    """k Bloom bit positions as SQL fragments. h >= 0, so the arithmetic
    never goes negative and Spark/DuckDB ``%`` agree."""
    return [
        f"((({_A0 + _DA * i} * ({h_sql}) + {_B0 + _DB * i}) % {_P}) % {m_bits})"
        for i in range(n_hashes)
    ]


def bloom_build(
    ref: DataFrame,
    text_col: str = "text",
    m_bits: int = 1 << 18,
    n_hashes: int = 4,
) -> DataFrame:
    """ONE-ROW DataFrame ``{bloom: map<int,long>}`` — the filter's non-zero
    64-bit words keyed by word index. The only shuffle is the bit_or
    partial aggregate on <= m/64 integer keys."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos_sqls = _positions_sql(_h_sql(text_col), m_bits, n_hashes)
    words = (
        ref.select(F.expr(f"explode(array({', '.join(pos_sqls)})) as pos"))
        .select(
            F.expr("cast(pos div 64 as int)").alias("w"),
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 64 as int))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "word"))).alias("bloom")
    )


def bloom_probe(
    docs: DataFrame,
    bloom: DataFrame,
    text_col: str = "text",
    m_bits: int = 1 << 18,
    n_hashes: int = 4,
    out_col: str = "maybe_in_ref",
) -> DataFrame:
    """Flag each doc whose content MAY be in the reference corpus (no false
    negatives; deterministic false positives at the Bloom rate). Adds
    ``out_col`` boolean; the corpus side is never shuffled — the one-row
    bloom map broadcasts and the k probes are codegen expressions."""
    hit_sqls = [
        f"((coalesce(element_at(bloom, cast(({p}) div 64 as int)),"
        f" cast(0 as bigint))"
        f" & shiftleft(cast(1 as bigint), cast(({p}) % 64 as int))) != 0)"
        for p in _positions_sql(_h_sql(text_col), m_bits, n_hashes)
    ]
    return (
        docs.crossJoin(F.broadcast(bloom))
        .withColumn(out_col, F.expr(" AND ".join(hit_sqls)))
        .drop("bloom")
    )


def bloom_dedup(
    docs: DataFrame,
    ref: DataFrame,
    text_col: str = "text",
    m_bits: int = 1 << 18,
    n_hashes: int = 4,
    keep_flag: bool = False,
) -> DataFrame:
    """Dolma-style membership dedup: drop docs whose ``text_col`` content
    is (probably) present in ``ref``. ``keep_flag=True`` returns all docs
    with the ``maybe_in_ref`` flag instead of filtering — the audit /
    quarantine shape."""
    flagged = bloom_probe(
        docs, bloom_build(ref, text_col, m_bits, n_hashes),
        text_col, m_bits, n_hashes,
    )
    if keep_flag:
        return flagged
    return flagged.filter(~F.col("maybe_in_ref")).drop("maybe_in_ref")


def bloom_oracle_sql(
    docs_sql: str,
    ref_sql: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 18,
    n_hashes: int = 4,
) -> str:
    """The DuckDB mirror of build+probe, for driver oracle rows: identical
    md5-affine positions, bit_or words, k-way AND probe."""
    pos = [
        f"((({_A0 + _DA * i}::BIGINT * h + {_B0 + _DB * i}) % {_P}) % {m_bits})"
        for i in range(n_hashes)
    ]
    rpos_rows = " UNION ALL ".join(f"SELECT {p} AS pos FROM rh" for p in pos)
    pos_rows = " UNION ALL ".join(
        f"SELECT {id_col}, {p} AS pos FROM h" for p in pos
    )
    return f"""
        WITH rh AS (
            SELECT (('0x' || substr(md5({text_col}), 1, 8))::BIGINT) AS h
            FROM ({ref_sql})
        ),
        rpos AS ({rpos_rows}),
        -- UBIGINT words: DuckDB raises on signed 1<<63; Spark's signed
        -- long wraps to the sign bit. Only the FLAG must match engines,
        -- so the oracle's word lattice may use the unsigned domain.
        words AS (
            SELECT pos // 64 AS w, bit_or(1::UBIGINT << (pos % 64)::INT) AS word
            FROM rpos GROUP BY 1
        ),
        h AS (
            SELECT {id_col},
                   (('0x' || substr(md5({text_col}), 1, 8))::BIGINT) AS h
            FROM ({docs_sql})
        ),
        probes AS ({pos_rows}),
        hit AS (
            SELECT p.{id_col},
                   coalesce(w.word, 0::UBIGINT)
                     & (1::UBIGINT << (p.pos % 64)::INT) <> 0 AS hit
            FROM probes p LEFT JOIN words w ON w.w = p.pos // 64
        )
        SELECT {id_col}, bool_and(hit) AS maybe_in_ref
        FROM hit GROUP BY {id_col}
    """
