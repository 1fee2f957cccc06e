"""Automatic file-pruning hints derived from SQL predicates.

``IceTable.read`` takes explicit pruning hints (``partition_values``,
``column_ranges``, ``column_equals``); the reference's v2 analog is a
range-pruned ``get_files`` macro users call by hand
(``/root/reference/examples/segment-webhook-sink.py:84-90``). But the log
already knows everything needed to derive those hints from a query's WHERE
clause — users shouldn't have to restate their predicates as kwargs.

:func:`derive_scan_hints` extracts simple conjunctive predicates from a
single-table SELECT over the snapshot view and maps them onto the three
hint kinds. It is deliberately CONSERVATIVE: pruning hints must only ever
remove provably-irrelevant files, so anything it cannot prove — OR / NOT
at the top level, subqueries, joins, non-literal operands, type-ambiguous
partition-path comparisons — yields no hint (the scan stays correct, just
unpruned). Catalyst still applies the full predicate to the rows of every
kept file; the hints only shrink the file list the scan starts from.

Scale note: this is pure driver-side metadata arithmetic over the query
string + the folded log — zero data I/O. At 100 TB the difference between
"scan every alive file" and "scan the two files whose zone maps overlap"
IS the query latency; deriving it automatically makes the fast path the
default path.
"""

from __future__ import annotations

import re
from typing import Optional, Union

# clauses that terminate a WHERE at depth 0
_TERMINATORS = r"group\s+by|order\s+by|having|limit|window|qualify"
# keywords that may directly follow "FROM view" and thus are not an alias
_NON_ALIAS = {
    "where", "group", "order", "having", "limit", "union", "intersect",
    "except", "window", "qualify", "join", "inner", "left", "right",
    "full", "cross", "on", "using",
}

_NUM = r"-?\d+(?:\.\d+)?"
_STR = r"'(?:[^']|'')*'"
_LIT = rf"(?:{_NUM}|{_STR})"
_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


def _parse_literal(tok: str) -> Union[int, float, str]:
    tok = tok.strip()
    if tok.startswith("'"):
        return tok[1:-1].replace("''", "'")
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    return float(tok)


def _strip_qualifier(col: str, names: set[str]) -> Optional[str]:
    """``alias.col`` / ``view.col`` → ``col``; unknown qualifiers → None."""
    if "." in col:
        qual, _, base = col.partition(".")
        return base if qual.lower() in names else None
    return col


def _split_conjuncts(clause: str) -> Optional[list[str]]:
    """Split a WHERE clause on top-level AND, keeping BETWEEN..AND intact.

    Returns None when the clause contains top-level OR / NOT — a structure
    where per-conjunct pruning would be unsound.
    """
    parts: list[str] = []
    depth = 0
    pending_between = 0
    buf: list[str] = []
    # tokenize preserving quoted strings
    for tok in re.findall(rf"{_STR}|\(|\)|[^\s()]+", clause):
        low = tok.lower()
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth = max(0, depth - 1)
        if depth == 0:
            if low == "or":
                return None
            if low == "not":
                return None
            if low == "between":
                pending_between += 1
            elif low == "and":
                if pending_between:
                    pending_between -= 1
                else:
                    parts.append(" ".join(buf))
                    buf = []
                    continue
        buf.append(tok)
    if buf:
        parts.append(" ".join(buf))
    return parts


def _find_where(query: str, view: str) -> Optional[tuple[str, set[str]]]:
    """The WHERE clause of a single-table query over ``view``, plus the
    set of names (view + alias) predicates may be qualified with.

    None when the query shape is anything but one plain ``FROM view``
    (joins, unions, subqueries, multiple FROMs): a WHERE found there could
    belong to a different relation, and a wrong hint silently drops files.
    """
    q = re.sub(r"\s+", " ", query).strip().rstrip(";")
    low = q.lower()
    if len(re.findall(r"\bfrom\b", low)) != 1:
        return None
    if re.search(r"\b(join|union|intersect|except)\b", low):
        return None
    m = re.search(rf"\bfrom\s+({_IDENT})(?:\s+(?:as\s+)?({_IDENT}))?", q, re.I)
    if not m or m.group(1).lower() != view.lower():
        return None
    if q[m.end():].lstrip().startswith(","):
        return None  # comma cross join — predicates may belong to either side
    names = {view.lower()}
    if m.group(2) and m.group(2).lower() not in _NON_ALIAS:
        names.add(m.group(2).lower())
    wm = re.search(rf"\bwhere\b(.*?)(?:\b(?:{_TERMINATORS})\b|$)", q, re.I | re.S)
    if not wm:
        return None
    return wm.group(1).strip(), names


def derive_scan_hints(
    query: str,
    view: str,
    identity_partition_cols: dict[str, str],
    transform_partition_cols: Optional[dict] = None,
) -> dict:
    """Pruning kwargs for :meth:`IceTable.read`, derived from ``query``.

    ``identity_partition_cols`` maps a DATA column name to the partition
    FIELD name for every partition field whose expression is the bare
    column (identity transform) — the only case where a column predicate
    translates to a partition-path predicate without evaluating the
    transform.

    Returns a (possibly empty) dict with any of ``partition_values``,
    ``column_ranges``, ``column_equals``. Per-conjunct rules:

    * ``col = lit`` → partition equality (identity partition cols; int or
      string literals — float path renderings are representation-sensitive)
      AND a zone-map/Bloom ``column_equals`` hint.
    * ``col BETWEEN a AND b`` / ``col >= a`` / ``col <= b`` / ``col > a`` /
      ``col < b`` → ``column_ranges`` (strict bounds widen to inclusive —
      a superset, sound for skipping). Partition-path ranges additionally
      require STRING literals: the path stores strings, and numeric ranges
      compare lexicographically there ("10" < "9").
    * ``col IN (lits)`` → partition membership for identity partition cols
      AND an any-value zone-map/Bloom ``column_in`` hint for the data
      column (a file survives if ANY listed value may be present).
    * anything else contributes nothing.

    ``transform_partition_cols`` maps a DATA column to ``(field,
    eval_fn)`` for partition fields built from a MONOTONIC date transform
    of that column (e.g. ``date_format(timestamp_micros(ts div 1000),
    'yyyy-MM')``). After the conjunct pass, any equality / range / IN
    bounds collected on the column are pushed through ``eval_fn`` into a
    partition-path hint — the Iceberg-transform-pruning analog: a plain
    ``ts BETWEEN a AND b`` prunes month partitions without the user ever
    naming the partition field. ``eval_fn`` returning None (evaluation
    failed) contributes nothing.
    """
    found = _find_where(query, view)
    if not found:
        return {}
    clause, names = found
    conjuncts = _split_conjuncts(clause)
    if conjuncts is None:
        return {}

    partition_values: dict[str, Union[str, tuple, list]] = {}
    column_ranges: dict[str, list] = {}
    column_equals: dict = {}
    column_in: dict[str, list] = {}

    def add_range(col: str, lo, hi) -> None:
        cur = column_ranges.setdefault(col, [None, None])
        try:
            if lo is not None and (cur[0] is None or lo > cur[0]):
                cur[0] = lo
            if hi is not None and (cur[1] is None or hi < cur[1]):
                cur[1] = hi
        except TypeError:  # mixed-type conjuncts — keep the first bound
            pass

    def add_part_range(field: str, lo, hi) -> None:
        cur = partition_values.get(field)
        if isinstance(cur, tuple) or cur is None:
            lo0, hi0 = cur if isinstance(cur, tuple) else (None, None)
            if lo is not None and (lo0 is None or lo > lo0):
                lo0 = lo
            if hi is not None and (hi0 is None or hi < hi0):
                hi0 = hi
            partition_values[field] = (lo0, hi0)

    for conj in conjuncts:
        c = conj.strip()
        while c.startswith("(") and c.endswith(")"):
            inner = c[1:-1].strip()
            if _split_conjuncts(inner) is None:
                break
            c = inner
        m = re.fullmatch(
            rf"({_IDENT}(?:\.{_IDENT})?)\s*=\s*({_LIT})", c, re.I
        ) or re.fullmatch(rf"({_LIT})\s*=\s*({_IDENT}(?:\.{_IDENT})?)", c, re.I)
        if m:
            a, b = m.group(1), m.group(2)
            col_tok, lit_tok = (a, b) if re.fullmatch(_LIT, b) else (b, a)
            col = _strip_qualifier(col_tok, names)
            if not col:
                continue
            val = _parse_literal(lit_tok)
            field = identity_partition_cols.get(col)
            if field is not None and not isinstance(val, float):
                partition_values[field] = str(val)
            column_equals[col] = val
            add_range(col, val, val)
            continue
        m = re.fullmatch(
            rf"({_IDENT}(?:\.{_IDENT})?)\s+between\s+({_LIT})\s+and\s+({_LIT})",
            c,
            re.I,
        )
        if m:
            col = _strip_qualifier(m.group(1), names)
            if not col:
                continue
            lo, hi = _parse_literal(m.group(2)), _parse_literal(m.group(3))
            add_range(col, lo, hi)
            field = identity_partition_cols.get(col)
            if field and isinstance(lo, str) and isinstance(hi, str):
                add_part_range(field, lo, hi)
            continue
        m = re.fullmatch(
            rf"({_IDENT}(?:\.{_IDENT})?)\s*(>=|<=|>|<)\s*({_LIT})", c, re.I
        ) or re.fullmatch(
            rf"({_LIT})\s*(>=|<=|>|<)\s*({_IDENT}(?:\.{_IDENT})?)", c, re.I
        )
        if m:
            a, op, b = m.group(1), m.group(2), m.group(3)
            if re.fullmatch(_LIT, a):
                # literal OP col  ≡  col FLIPPED-OP literal
                col_tok, lit_tok = b, a
                op = {">": "<", "<": ">", ">=": "<=", "<=": ">="}[op]
            else:
                col_tok, lit_tok = a, b
            col = _strip_qualifier(col_tok, names)
            if not col:
                continue
            val = _parse_literal(lit_tok)
            lo, hi = (val, None) if op in (">", ">=") else (None, val)
            add_range(col, lo, hi)
            field = identity_partition_cols.get(col)
            if field and isinstance(val, str):
                add_part_range(field, lo, hi)
            continue
        m = re.fullmatch(
            rf"({_IDENT}(?:\.{_IDENT})?)\s+in\s*\(\s*({_LIT}(?:\s*,\s*{_LIT})*)\s*\)",
            c,
            re.I,
        )
        if m:
            col = _strip_qualifier(m.group(1), names)
            if not col:
                continue
            vals = [
                _parse_literal(t)
                for t in re.findall(_LIT, m.group(2))
            ]
            field = identity_partition_cols.get(col)
            if field and not any(isinstance(v, float) for v in vals):
                partition_values[field] = [str(v) for v in vals]
            # data-column IN: any-value zone-map/Bloom membership hint
            column_in[col] = vals
            continue

    for col, (field, eval_fn) in (transform_partition_cols or {}).items():
        if field in partition_values:
            continue  # an explicit path predicate already bounds the field
        if col in column_equals:
            fv = eval_fn(column_equals[col])
            if fv is not None:
                partition_values[field] = fv
            continue
        if col in column_in:
            fvals = [eval_fn(v) for v in column_in[col]]
            if all(v is not None for v in fvals):
                partition_values[field] = sorted(set(fvals))
            continue
        if col in column_ranges:
            lo, hi = column_ranges[col]
            flo = eval_fn(lo) if lo is not None else None
            fhi = eval_fn(hi) if hi is not None else None
            # a failed endpoint evaluation widens that side to open —
            # still sound, the transform is monotonic non-decreasing
            if flo is not None or fhi is not None:
                add_part_range(field, flo, fhi)

    out: dict = {}
    if partition_values:
        out["partition_values"] = partition_values
    if column_ranges:
        out["column_ranges"] = {k: tuple(v) for k, v in column_ranges.items()}
    if column_equals:
        out["column_equals"] = column_equals
    if column_in:
        out["column_in"] = column_in
    return out
