"""IPLoM (Iterative Partitioning Log Mining) re-expressed Spark-first.

Capability parity target: /root/reference/logai/algorithms/parsing_algo/iplom.py
(itself a wrapper of the public logpai/logparser IPLoM), which partitions the
log corpus by (1) token count, (2) the position with the fewest distinct
tokens, (3) token-pair mapping relations (1-1 / 1-M / M-1 / M-M), then
extracts one template per final partition — positions with >1 distinct token
become the wildcard (iplom.py:115-151, 153-214, 215-413, 414-453).

Spark-first re-expression (NOT a port of the reference's single-list loop):

* Step-1's token-count partitions are fully independent with the default
  thresholds (PST=0 routes nothing to the shared outlier partition,
  iplom.py:145-151), so the whole refinement runs as
  ``groupBy(n_tokens).applyInPandas(...)`` — each token-length group refines
  in parallel on one executor.
* The per-group core works on DISTINCT lines weighted by their counts.
  Duplicate lines never split apart (all steps key on token values), and the
  only count-sensitive decisions (partition sizes, the rank-position
  line-match counts, iplom.py:306-313) are reproduced exactly by weighting,
  so the output mapping is identical while Python-side work drops by the
  corpus duplication factor.
* The fact table gets its template by a hash join against the distinct-line
  mapping (JVM-side), never a per-row Python call.

Default-parameter notes mirrored from the reference: CT=0 makes step 3 a
no-op for partitions wider than two tokens (GC < CT is never true,
iplom.py:523-530); PST=0 disables outlier rebalancing; lines longer than
``max_event_len`` tokens (which crash the reference with an IndexError) map
to the null template and belong in a dead-letter sink.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd

TOKEN_SPLIT = re.compile(r"[\s=:,]")
WILDCARD = "<*>"
OUTLIER_TEMPLATE = "Outlier"


@dataclass
class IPLoMConfig:
    """Thresholds per iplom.py:49-70 (names de-camelized)."""

    rex: list[str] = field(default_factory=list)
    max_event_len: int = 200
    step2_support: float = 0.0
    pst: float = 0.0  # partition support threshold
    ct: float = 0.0  # cluster goodness threshold (step-3 gate)
    lower_bound: float = 0.25
    upper_bound: float = 0.9
    #: parallelism/memory bound WITHIN a token-count group. The refinement
    #: unit is one (token count) group of distinct lines; a web-scale corpus
    #: with one dominant line length would put that whole group's distinct
    #: lines in a single executor's pandas frame. shards_per_group > 1 splits
    #: each group by a deterministic content hash (pmod(xxhash64(line))) —
    #: cluster-size-invariant — refines each shard independently, and merges
    #: templates by equality. Trade-off, documented: refinement decisions see
    #: only the shard's distinct lines, so a position whose few values split
    #: unluckily across shards can template differently than the unsharded
    #: run (in practice identical when each position's value diversity >>
    #: shard count). Default 1 = exact single-group semantics.
    shards_per_group: int = 1


def tokenize_iplom(line: str, rex: list[str] | None = None) -> list[str]:
    """Reference tokenization (iplom.py:124-131): optional regex scrubs, then
    split on whitespace/=/:/, with empty tokens dropped; an all-empty result
    becomes the single-space token."""
    for r in rex or []:
        line = re.sub(r, "", line)
    toks = [t for t in TOKEN_SPLIT.split(line) if t != ""]
    return toks if toks else [" "]


class _Part:
    """One partition of same-length token rows. ``rows`` holds indices into
    the group's token table; ``step`` tracks which phase created it (the
    reference's stepNo, which gates the step-3 column heuristics)."""

    __slots__ = ("rows", "step", "valid")

    def __init__(self, rows: list[int], step: int):
        self.rows = rows
        self.step = step
        self.valid = True


class IPLoMCore:
    """Refine one token-length group; weighted-distinct semantics.

    ``fit(tokens, counts)`` takes parallel lists: tokens[i] is a token tuple
    (all the same length), counts[i] its duplicate count. Returns the list of
    per-row template strings (same order as the input).
    """

    def __init__(self, config: IPLoMConfig | None = None):
        self.cfg = config or IPLoMConfig()

    # -- helpers -----------------------------------------------------------
    @staticmethod
    def _col_values(tokens: list[tuple[str, ...]], rows: list[int], col: int) -> set:
        return {tokens[i][col] for i in rows}

    def _rank_position(self, card: int, weight: int, one_to_m: bool) -> int:
        """Constant-vs-variable call for the M side (iplom.py:473-502):
        distance = |S| / lines-matching-S against the lower/upper bounds."""
        if weight == 0:
            return 1 if one_to_m else 2
        distance = card / weight
        if distance <= self.cfg.lower_bound:
            return 2 if one_to_m else 1
        # the >= upper_bound and the in-between branch pick the same side
        return 1 if one_to_m else 2

    def _determine_p1_p2(
        self, tokens: list[tuple[str, ...]], part: _Part, width: int
    ) -> tuple[int, int]:
        """Column-pair choice for step 3 (iplom.py:504-531)."""
        if width == 2:
            return 0, 1
        if width < 2:
            return -1, -1
        uniq = [len(self._col_values(tokens, part.rows, c)) for c in range(width)]
        ones = sum(1 for u in uniq if u == 1)
        if not (ones / width < self.cfg.ct):
            return -1, -1
        return self._mapping_position(uniq, part.step)

    @staticmethod
    def _mapping_position(uniq: list[int], step: int) -> tuple[int, int]:
        """iplom.py:533-628: pick the two columns by cardinality frequency —
        most-frequent cardinality for step-2-born partitions, least-frequent
        for step-1 survivors. The single-pass max/second-max scans (including
        their sentinel edge cases, e.g. all-frequencies-equal yielding no
        second choice) are reproduced exactly."""
        freq: dict[int, int] = {}  # cardinality -> #columns (insertion order)
        for u in uniq:
            freq[u] = freq.get(u, 0) + 1
        if step == 2:
            max_card = second_card = None
            max_n = second_n = 0
            for card, n in freq.items():
                if card == 1:
                    continue
                if n > max_n:
                    second_card, second_n = max_card, max_n
                    max_card, max_n = card, n
                elif n > second_n and n != max_n:
                    second_card, second_n = card, n
            if max_n > 1:
                hits = [i for i, u in enumerate(uniq) if u == max_card]
                return (hits[0], hits[1]) if len(hits) > 1 else (-1, -1)
            p1 = next((i for i, u in enumerate(uniq) if u == max_card), -1)
            p2 = next((i for i, u in enumerate(uniq) if u == second_card), -1)
            return (p1, p2) if p1 != -1 and p2 != -1 else (-1, -1)
        # step-1 survivor: least-frequent cardinality first; column lookup is
        # by frequency value, mirroring iplom.py:600-628
        min_n = second_n = None
        for _, n in freq.items():
            if min_n is None or n < min_n:
                second_n = min_n
                min_n = n
            elif (second_n is None or n < second_n) and n != min_n:
                second_n = n
        p1 = next((i for i, u in enumerate(uniq) if freq[u] == min_n), -1)
        p2 = next(
            (i for i, u in enumerate(uniq) if second_n is not None and freq[u] == second_n),
            -1,
        )
        return p1, p2

    # -- steps -------------------------------------------------------------
    def _step2(self, tokens, counts, parts: list[_Part]) -> list[_Part]:
        """Split by the least-diverse column (iplom.py:153-214); one round."""
        out = []
        for part in parts:
            width = len(tokens[part.rows[0]])
            size = sum(counts[i] for i in part.rows)
            if size <= self.cfg.step2_support:
                out.append(part)
                continue
            uniq_counts = [len(self._col_values(tokens, part.rows, c)) for c in range(width)]
            min_col = min(range(width), key=lambda c: uniq_counts[c])
            if uniq_counts[min_col] == 1:
                out.append(part)
                continue
            groups: dict[str, list[int]] = {}
            for i in part.rows:
                groups.setdefault(tokens[i][min_col], []).append(i)
            for rows in groups.values():
                out.append(_Part(rows, step=2))
        return out

    def _step3(self, tokens, counts, parts: list[_Part]) -> list[_Part]:
        """Mapping-relation split (iplom.py:215-413)."""
        out = []
        for part in parts:
            width = len(tokens[part.rows[0]])
            p1, p2 = self._determine_p1_p2(tokens, part, width)
            if p1 == -1 or p2 == -1:
                out.append(part)
                continue
            fwd: dict[str, set] = {}
            rev: dict[str, set] = {}
            for i in part.rows:
                a, b = tokens[i][p1], tokens[i][p2]
                fwd.setdefault(a, set()).add(b)
                rev.setdefault(b, set()).add(a)
            one_one = {
                a for a, bs in fwd.items() if len(bs) == 1 and len(rev[next(iter(bs))]) == 1
            }
            one_m = {
                a
                for a, bs in fwd.items()
                if len(bs) > 1 and all(len(rev[b]) == 1 for b in bs)
            }
            m_one = {
                b
                for b, as_ in rev.items()
                if len(as_) > 1 and all(len(fwd[a]) == 1 for a in as_)
            }
            # weighted lines-matching counts for the rank-position calls
            w1 = {a: 0 for a in one_m}
            w2 = {b: 0 for b in m_one}
            for i in part.rows:
                a, b = tokens[i][p1], tokens[i][p2]
                if a in w1:
                    w1[a] += counts[i]
                if b in w2:
                    w2[b] += counts[i]
            # residual M-M side sizes (iplom.py:283-303 removes matched tokens)
            p1_rest = {tokens[i][p1] for i in part.rows} - one_one - one_m
            p1_rest -= {a for b in m_one for a in rev[b]}
            p2_rest = {tokens[i][p2] for i in part.rows}
            p2_rest -= {next(iter(fwd[a])) for a in one_one}
            p2_rest -= {b for a in one_m for b in fwd[a]} | m_one

            # partitions are keyed by the BARE token value, exactly like the
            # reference's newPartitionsD (iplom.py:315-393): when one string
            # is routed via p1 for some lines and via p2 for others, the
            # reference MERGES them into a single partition — keeping a
            # side-tag here would diverge per-line templates on such
            # collisions. The step-2 M-M dump bucket uses the reference's
            # literal sentinel key (same collision behavior included).
            _MM_DUMP = "dumpKeyforMMrelationInStep2__"
            groups: dict[str, list[int]] = {}
            for i in part.rows:
                a, b = tokens[i][p1], tokens[i][p2]
                if a in one_one:
                    key = a
                elif a in one_m:
                    side = self._rank_position(len(fwd[a]), w1[a], True)
                    key = a if side == 1 else b
                elif b in m_one:
                    side = self._rank_position(len(rev[b]), w2[b], False)
                    key = a if side == 1 else b
                elif part.step == 2:
                    key = _MM_DUMP
                else:
                    key = a if len(p1_rest) < len(p2_rest) else b
                groups.setdefault(key, []).append(i)
            for rows in groups.values():
                out.append(_Part(rows, step=3))
        return out

    def _step4_template(self, tokens, part: _Part) -> str:
        width = len(tokens[part.rows[0]])
        first = tokens[part.rows[0]]
        cols = [
            first[c] if len(self._col_values(tokens, part.rows, c)) == 1 else WILDCARD
            for c in range(width)
        ]
        return " ".join(cols)

    def fit(self, tokens: list[tuple[str, ...]], counts: list[int]) -> list[str]:
        if not tokens:
            return []
        parts = [_Part(list(range(len(tokens))), step=1)]
        parts = self._step2(tokens, counts, parts)
        parts = self._step3(tokens, counts, parts)
        result = [""] * len(tokens)
        for part in parts:
            tpl = self._step4_template(tokens, part)
            for i in part.rows:
                result[i] = tpl
        return result


def iplom_map_distinct(
    lines: pd.Series, counts: pd.Series, config: IPLoMConfig | None = None
) -> pd.Series:
    """Template for each DISTINCT line (weighted); pandas-side core used by
    both the Spark wrapper and unit tests."""
    cfg = config or IPLoMConfig()
    toks = [tuple(tokenize_iplom(ln, cfg.rex)) for ln in lines]
    by_len: dict[int, list[int]] = {}
    for i, t in enumerate(toks):
        if len(t) <= cfg.max_event_len:
            by_len.setdefault(len(t), []).append(i)
    out = pd.Series([None] * len(lines), index=lines.index, dtype=object)
    core = IPLoMCore(cfg)
    cnt = counts.tolist()
    pos = lines.index.tolist()
    for _, idxs in by_len.items():
        tpls = core.fit([toks[i] for i in idxs], [cnt[i] for i in idxs])
        for i, tpl in zip(idxs, tpls):
            out.at[pos[i]] = tpl
    return out


def parse_iplom(df, column: str = "logline", config: IPLoMConfig | None = None):
    """Distributed IPLoM: distinct-with-counts -> per-token-length
    applyInPandas refinement -> hash join back onto the fact table.

    Returns (DataFrame with an added ``template`` column, [(template, size)]).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cfg = config or IPLoMConfig()
    distinct = (
        df.select(column)
        .filter(F.col(column).isNotNull() & (F.trim(F.col(column)) != ""))
        .groupBy(column)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    # group key = reference token count (split on [\s=:,], empties dropped)
    toks = F.filter(F.split(F.col(column), r"[\s=:,]"), lambda x: x != "")
    keyed = distinct.withColumn(
        "_n", F.when(F.size(toks) > 0, F.size(toks)).otherwise(F.lit(1))
    )
    # skew bound: shard within the token-count group by content hash (see
    # IPLoMConfig.shards_per_group) so one dominant line length cannot land
    # an unbounded distinct-line set in a single task's pandas frame
    n_shards = max(int(cfg.shards_per_group), 1)
    keyed = keyed.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(column)), F.lit(n_shards))
    )

    schema = T.StructType(
        [
            T.StructField(column, T.StringType()),
            T.StructField("template", T.StringType()),
        ]
    )

    def _refine(pdf: pd.DataFrame) -> pd.DataFrame:
        tpl = iplom_map_distinct(pdf[column], pdf["_cnt"], cfg)
        return pd.DataFrame({column: pdf[column], "template": tpl})

    mapping = keyed.groupBy("_n", "_shard").applyInPandas(_refine, schema)
    joined = df.join(mapping, column, "left")
    sizes = [
        (r["template"], int(r["n"]))
        for r in mapping.join(df.select(column), column)
        .groupBy("template")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    sizes.sort(key=lambda ts: (-ts[1], ts[0] or ""))
    return joined, sizes
