"""ES query-DSL -> Catalyst Column compiler.

The reference's ``es_query`` escape hatch ANDs a raw ES query-DSL dict
into the search body (eland/query_compiler.py:490-491); its own
predicate layer emits the same DSL shapes (eland/filter.py:23-201:
term/terms/range/exists/ids/wildcard/prefix/regexp/bool). This module
compiles that dict language into a single boolean Column so DSL
escape-hatch queries stay inside Catalyst — pushdown-eligible, never a
driver-side post-filter.

Null semantics follow ES document-presence logic: a leaf predicate on
a missing (null) field does NOT match (Spark's NULL-as-false filter
sink already gives this), and ``must_not`` of it DOES — that one spot
needs ``~coalesce(pred, false)``. Leaves stay bare so positive
predicates remain pushdown-eligible.

Relevance-scored leaves (match/match_phrase) keep the engine's boolean
text-match semantics (see Series.es_match): tokenized word-boundary
matching, optional fuzziness; BM25 scoring is out of relational scope.
"""

from __future__ import annotations

import re
from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["compile_es_dsl"]


def _nn(pred: Column) -> Column:
    """Identity wrapper kept at every leaf for readability: a NULL leaf
    predicate already behaves as no-match in a filter sink, and keeping
    leaves bare (no coalesce) is what lets Catalyst push them into the
    parquet scan (pinned in tests). Presence semantics for negation are
    handled at the must_not site instead."""
    return pred


def _one(d: dict) -> tuple[str, Any]:
    if len(d) != 1:
        raise ValueError(f"expected a single-key object, got keys {sorted(d)}")
    return next(iter(d.items()))


def _wildcard_to_regex(pattern: str) -> str:
    # ES wildcard: * = any sequence, ? = any single char; anchored both ends
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def _match_tokens(col: Column, text: str, fuzziness: int | str | None) -> Column:
    conds = []
    for tok in str(text).split():
        k = 0
        if fuzziness is not None:
            if isinstance(fuzziness, str):
                if fuzziness.upper() != "AUTO":
                    raise ValueError(f"unsupported fuzziness {fuzziness!r}")
                k = 0 if len(tok) < 3 else (1 if len(tok) <= 5 else 2)
            else:
                k = int(fuzziness)
        if k == 0:
            conds.append(
                F.lower(col).rlike(r"\b" + re.escape(tok.lower()) + r"\b")
            )
        else:
            words = F.filter(
                F.split(F.lower(col), r"[^0-9a-z]+"), lambda w: w != ""
            )

            def _within(t: str, dist: int) -> Callable[[Column], Column]:
                return lambda w: F.levenshtein(w, F.lit(t)) <= F.lit(dist)

            conds.append(F.exists(words, _within(tok.lower(), k)))
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out


def _term_pred(col: Column, tok: str) -> Column:
    """One analyzed-term predicate: wildcard tokens match any word of
    the field, plain tokens word-boundary match (es_match semantics)."""
    if "*" in tok or "?" in tok:
        pat = _wildcard_to_regex(tok)
        words = F.filter(F.split(F.lower(col), r"[^0-9a-z]+"), lambda w: w != "")
        return F.exists(words, lambda w: w.rlike(pat))
    return F.lower(col).rlike(r"\b" + re.escape(tok) + r"\b")


def _phrase_pred(col: Column, text: str) -> Column:
    pattern = (
        r"\b" + r"\s+".join(re.escape(t) for t in str(text).lower().split()) + r"\b"
    )
    return F.lower(col).rlike(pattern)


def _fields_pred(fields, resolve, leaf) -> Column:
    """OR across fields (best_fields boolean semantics); `name^boost`
    boost suffixes are accepted and ignored (scoring out of scope)."""
    preds = [leaf(F.col(resolve(str(f).split("^")[0]))) for f in fields]
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def _negate(pred: Column) -> Column:
    # ES presence semantics: NOT of a predicate on a missing field KEEPS
    # the doc (same rule as bool.must_not above)
    return ~F.coalesce(pred, F.lit(False))


class _TokenStream:
    def __init__(self, toks: list[str]):
        self._toks = toks
        self._i = 0

    def peek(self) -> str | None:
        return self._toks[self._i] if self._i < len(self._toks) else None

    def advance(self) -> str:
        t = self._toks[self._i]
        self._i += 1
        return t

    def expect(self, tok: str) -> None:
        if self.peek() != tok:
            raise ValueError(f"expected {tok!r} at position {self._i}")
        self.advance()


def _simple_query_string(body: dict, resolve) -> Column:
    """ES ``simple_query_string`` subset: ``+`` (AND), ``|`` (OR),
    leading ``-`` (NOT), ``"phrase"``, ``*``/``?`` wildcards, and
    parentheses; ``default_operator`` joins bare adjacent terms
    (ES default OR). Scoring is out of scope — pure boolean match."""
    text = str(body["query"])
    fields = body.get("fields") or []
    if not fields:
        raise ValueError("simple_query_string requires fields")
    default_and = str(body.get("default_operator", "or")).lower() == "and"
    toks = re.findall(r'"[^"]*"|[()|+]|[^\s()|+"]+', text)
    ts = _TokenStream(toks)

    def parse_expr() -> Column:
        node = parse_unary()
        while True:
            t = ts.peek()
            if t is None or t == ")":
                return node
            if t == "|":
                ts.advance()
                node = node | parse_unary()
            elif t == "+":
                ts.advance()
                node = node & parse_unary()
            else:
                rhs = parse_unary()
                node = (node & rhs) if default_and else (node | rhs)

    def parse_unary() -> Column:
        t = ts.peek()
        if t is None:
            raise ValueError("unexpected end of simple_query_string")
        if t == "(":
            ts.advance()
            node = parse_expr()
            ts.expect(")")
            return node
        tok = ts.advance()
        neg = tok.startswith("-") and len(tok) > 1
        if neg:
            tok = tok[1:]
        if tok.startswith('"') and tok.endswith('"') and len(tok) >= 2:
            leaf = lambda c, tx=tok[1:-1]: _phrase_pred(c, tx)  # noqa: E731
        else:
            leaf = lambda c, tk=tok.lower(): _term_pred(c, tk)  # noqa: E731
        pred = _fields_pred(fields, resolve, leaf)
        return _negate(pred) if neg else pred

    return parse_expr()


def _query_string(body, resolve) -> Column:
    """Lucene ``query_string`` subset: AND/OR/NOT (and &&/||/!),
    parentheses, ``field:value``, quoted phrases, ``*``/``?``
    wildcards, ``+``/``-`` term prefixes; precedence OR < AND < NOT,
    implicit adjacency uses ``default_operator`` (ES default OR).
    Unsupported Lucene constructs (ranges, ``term~`` fuzziness) raise
    rather than silently mis-match."""
    if isinstance(body, str):
        body = {"query": body}
    text = str(body["query"])
    fields = body.get("fields") or (
        [body["default_field"]] if body.get("default_field") else None
    )
    if not fields:
        raise ValueError("query_string requires fields or default_field")
    default_and = str(body.get("default_operator", "or")).lower() == "and"
    toks = re.findall(r'[^\s()!"]*"[^"]*"|\(|\)|&&|\|\||!|[^\s()!"]+', text)
    ts = _TokenStream(toks)

    def parse_or() -> Column:
        node = parse_and()
        while ts.peek() in ("OR", "||"):
            ts.advance()
            node = node | parse_and()
        return node

    def parse_and() -> Column:
        node = parse_not()
        while True:
            t = ts.peek()
            if t in ("AND", "&&"):
                ts.advance()
                node = node & parse_not()
            elif t is None or t in (")", "OR", "||"):
                return node
            else:
                rhs = parse_not()
                node = (node & rhs) if default_and else (node | rhs)

    def parse_not() -> Column:
        if ts.peek() in ("NOT", "!"):
            ts.advance()
            return _negate(parse_not())
        return parse_atom()

    def parse_atom() -> Column:
        t = ts.peek()
        if t is None:
            raise ValueError("unexpected end of query_string")
        if t == "(":
            ts.advance()
            node = parse_or()
            ts.expect(")")
            return node
        tok = ts.advance()
        if tok.startswith("+"):
            tok = tok[1:]
        neg = tok.startswith("-") and len(tok) > 1
        if neg:
            tok = tok[1:]
        fl = list(fields)
        if ":" in tok and not tok.startswith('"'):
            fpart, tok = tok.split(":", 1)
            fl = [fpart]
        if "~" in tok or (tok and tok[0] in "[{"):
            raise ValueError(f"unsupported query_string construct: {tok!r}")
        if tok.startswith('"') and tok.endswith('"') and len(tok) >= 2:
            leaf = lambda c, tx=tok[1:-1]: _phrase_pred(c, tx)  # noqa: E731
        else:
            leaf = lambda c, tk=tok.lower(): _term_pred(c, tk)  # noqa: E731
        pred = _fields_pred(fl, resolve, leaf)
        return _negate(pred) if neg else pred

    out = parse_or()
    if ts.peek() is not None:
        # ES query_string is strict: trailing tokens (e.g. an unmatched
        # ')') are a parse error, not silently dropped
        raise ValueError(f"unexpected token {ts.peek()!r} in query_string")
    return out


def compile_es_dsl(
    query: dict,
    resolve: Callable[[str], str] = lambda c: c,
    index_cols: tuple[str, ...] = (),
) -> Column:
    """Compile an ES query-DSL dict to a boolean Column.

    Supported: match_all, match_none, term, terms, range (gt/gte/lt/
    lte), exists, ids, wildcard, prefix, regexp, fuzzy, match,
    match_phrase, match_phrase_prefix, match_bool_prefix, multi_match
    (best_fields boolean semantics: any field matches),
    simple_query_string and a Lucene-subset query_string (AND/OR/NOT,
    field:value, phrases, wildcards), constant_score / dis_max /
    boosting (compiled to their filter semantics — scoring is out of
    relational scope), and arbitrarily nested bool {must, filter,
    should, must_not} (ES semantics: must == filter for filtering
    purposes; should with no must is a disjunction; clauses may be a
    list or a single object, matching what elasticsearch accepts)."""
    kind, body = _one(query)

    if kind == "match_all":
        return F.lit(True)

    if kind == "match_none":
        return F.lit(False)

    if kind == "bool":
        def clauses(key: str) -> list[Column]:
            raw = body.get(key, [])
            raw = raw if isinstance(raw, list) else [raw]
            return [compile_es_dsl(c, resolve, index_cols) for c in raw]

        conjuncts: list[Column] = clauses("must") + clauses("filter")
        shoulds = clauses("should")
        if shoulds:
            d = shoulds[0]
            for s in shoulds[1:]:
                d = d | s
            # ES: should is optional when must/filter present unless
            # minimum_should_match says otherwise; honor an explicit 1
            msm = body.get("minimum_should_match", 0 if conjuncts else 1)
            if msm:
                conjuncts.append(d)
        for n in clauses("must_not"):
            # ES must_not of a predicate on a missing/null field KEEPS
            # the doc; plain ~NULL would drop it — coalesce exactly here
            # (leaves stay bare so positive predicates push down)
            conjuncts.append(~F.coalesce(n, F.lit(False)))
        if not conjuncts:
            return F.lit(True)
        out = conjuncts[0]
        for c in conjuncts[1:]:
            out = out & c
        return out

    if kind == "term":
        field, spec = _one(body)
        value = spec["value"] if isinstance(spec, dict) else spec
        return _nn(F.col(resolve(field)) == F.lit(value))

    if kind == "terms":
        field, values = _one(body)
        return _nn(F.col(resolve(field)).isin(list(values)))

    if kind == "range":
        field, ops = _one(body)
        c = F.col(resolve(field))
        op_map = {"gt": c.__gt__, "gte": c.__ge__, "lt": c.__lt__, "lte": c.__le__}
        preds = []
        for op, v in ops.items():
            if op not in op_map:
                raise ValueError(f"unsupported range op {op!r}")
            preds.append(op_map[op](F.lit(v)))
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return _nn(out)

    if kind == "exists":
        return F.col(resolve(body["field"])).isNotNull()

    if kind == "ids":
        if not index_cols:
            raise ValueError("ids query needs an index column on the frame")
        return _nn(F.col(index_cols[0]).isin(list(body["values"])))

    if kind == "wildcard":
        field, spec = _one(body)
        value = spec["value"] if isinstance(spec, dict) else spec
        return _nn(F.col(resolve(field)).rlike(_wildcard_to_regex(str(value))))

    if kind == "prefix":
        field, spec = _one(body)
        value = spec["value"] if isinstance(spec, dict) else spec
        return _nn(F.col(resolve(field)).startswith(str(value)))

    if kind == "regexp":
        field, spec = _one(body)
        value = spec["value"] if isinstance(spec, dict) else spec
        # ES regexp is implicitly anchored; Spark rlike is substring-based
        return _nn(F.col(resolve(field)).rlike(f"^(?:{value})$"))

    if kind == "fuzzy":
        # term-level query: no analysis, the WHOLE value within edit
        # distance (consistent with term/wildcard treating columns as
        # keyword values); AUTO ladder matches es_match's
        field, spec = _one(body)
        value = str(spec["value"] if isinstance(spec, dict) else spec)
        fz = spec.get("fuzziness", "AUTO") if isinstance(spec, dict) else "AUTO"
        if isinstance(fz, str):
            if fz.upper() != "AUTO":
                raise ValueError(f"unsupported fuzziness {fz!r}")
            k = 0 if len(value) < 3 else (1 if len(value) <= 5 else 2)
        else:
            k = int(fz)
        c = F.col(resolve(field))
        return _nn(F.levenshtein(c, F.lit(value)) <= F.lit(k))

    if kind == "match_bool_prefix":
        # ES builds a bool SHOULD of term queries for all tokens but
        # the last, plus a prefix query on the last (default OR, like
        # match) — mirrored exactly
        field, spec = _one(body)
        text = str(spec["query"] if isinstance(spec, dict) else spec)
        toks = text.split()
        c = F.col(resolve(field))
        if not toks:
            return F.lit(False)
        last = toks[-1].lower()
        words = F.filter(F.split(F.lower(c), r"[^0-9a-z]+"), lambda w: w != "")
        out = F.exists(words, lambda w: w.startswith(last))
        if len(toks) > 1:
            out = out | _match_tokens(c, " ".join(toks[:-1]), None)
        return _nn(out)

    if kind == "multi_match":
        text = body["query"]
        fields = body.get("fields") or []
        if not fields:
            raise ValueError("multi_match requires fields")
        fuzziness = body.get("fuzziness")
        preds = [
            _nn(_match_tokens(F.col(resolve(f)), text, fuzziness)) for f in fields
        ]
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        return out

    if kind == "terms_set":
        # match when >= minimum_should_match of the terms appear in the
        # field (ES applies this to multi-valued/keyword fields; here a
        # scalar string column matches a term when it equals it or
        # contains it as a word)
        field, spec = _one(body)
        terms = [str(t) for t in spec["terms"]]
        msm = spec.get("minimum_should_match")
        if msm is None:
            raise ValueError(
                "terms_set requires minimum_should_match (field/script "
                "indirection is not supported on a relational store)"
            )
        c = F.col(resolve(field))
        hits = [
            F.when(
                (c == F.lit(t))
                | F.lower(c).rlike(r"\b" + re.escape(t.lower()) + r"\b"),
                1,
            ).otherwise(0)
            for t in terms
        ]
        total = hits[0]
        for h in hits[1:]:
            total = total + h
        return _nn(total >= F.lit(int(msm)))

    if kind == "constant_score":
        # scoring is out of relational scope: constant_score == its filter
        return compile_es_dsl(body["filter"], resolve, index_cols)

    if kind == "dis_max":
        # max-score disjunction -> boolean OR once scoring is dropped
        preds = [compile_es_dsl(q, resolve, index_cols) for q in body["queries"]]
        if not preds:
            return F.lit(False)
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        return out

    if kind == "boosting":
        # ES boosting DEMOTES negative matches but still returns them;
        # with scoring out of scope the match set is the positive query
        return compile_es_dsl(body["positive"], resolve, index_cols)

    if kind == "match_phrase_prefix":
        field, spec = _one(body)
        text = str(spec["query"] if isinstance(spec, dict) else spec)
        toks = text.lower().split()
        if not toks:
            return F.lit(False)
        c = F.col(resolve(field))
        parts = [re.escape(t) for t in toks]
        pattern = r"\b" + r"\s+".join(parts[:-1] + [parts[-1] + r"[0-9a-z]*"])
        return _nn(F.lower(c).rlike(pattern))

    if kind == "simple_query_string":
        return _simple_query_string(body, resolve)

    if kind == "query_string":
        return _query_string(body, resolve)

    if kind in ("match", "match_phrase"):
        field, spec = _one(body)
        if isinstance(spec, dict):
            text = spec["query"]
            fuzziness = spec.get("fuzziness")
        else:
            text, fuzziness = spec, None
        c = F.col(resolve(field))
        if kind == "match_phrase":
            pattern = (
                r"\b" + r"\s+".join(re.escape(t) for t in str(text).split()) + r"\b"
            )
            return _nn(F.lower(c).rlike(pattern.lower()))
        return _nn(_match_tokens(c, text, fuzziness))

    if kind == "more_like_this":
        # {"more_like_this": {"fields": [...], "like": "text...",
        #   "max_query_terms": 25, "minimum_should_match": "30%",
        #   "min_word_length": 0}}
        # ES selects the like-text's most significant terms (TF-IDF
        # inside ES) and matches docs sharing enough of them; without
        # server-side corpus stats the relational analog takes the
        # like-text's distinct terms (first-seen order, length-filtered,
        # capped) and counts word-boundary hits across the fields.
        fields = list(body.get("fields") or [])
        if not fields:
            raise ValueError("more_like_this requires fields")
        like = body.get("like")
        if not like:
            raise ValueError("more_like_this requires like text")
        texts = like if isinstance(like, list) else [like]
        min_len = int(body.get("min_word_length", 0) or 0)
        cap = int(body.get("max_query_terms", 25))
        seen: list[str] = []
        for t in texts:
            for w in re.findall(r"[0-9a-zA-Z_]+", str(t).lower()):
                if len(w) >= min_len and w not in seen:
                    seen.append(w)
        terms = seen[:cap]
        if not terms:
            return F.lit(False)
        msm_raw = body.get("minimum_should_match", "30%")
        if isinstance(msm_raw, str) and msm_raw.endswith("%"):
            msm = int(len(terms) * float(msm_raw[:-1]) / 100.0)  # ES rounds down
            msm = max(1, msm)
        else:
            msm = int(msm_raw)
        cols = [F.lower(F.col(resolve(f))) for f in fields]
        hits = []
        for t in terms:
            pat = r"\b" + re.escape(t) + r"\b"
            h = cols[0].rlike(pat)
            for c in cols[1:]:
                h = h | c.rlike(pat)
            hits.append(F.when(h, 1).otherwise(0))
        total = hits[0]
        for h in hits[1:]:
            total = total + h
        return _nn(total >= F.lit(msm))

    if kind == "geo_distance":
        # {"geo_distance": {"distance": "1500km", "<field>": {"lat": .., "lon": ..}}}
        # The geo_point field is a struct<lat double, lon double> column
        # (the engine's geo representation; ES stores an opaque point).
        # Haversine on the ES mean earth radius — a pure arithmetic
        # Column, pushdown-eligible like every other leaf.
        spec = dict(body)
        dist_m = _parse_distance(spec.pop("distance"))
        field, origin = _one(spec)
        c = F.col(resolve(field))
        d = _haversine_m(
            c.getField("lat"), c.getField("lon"),
            F.lit(float(origin["lat"])), F.lit(float(origin["lon"])),
        )
        return _nn(d <= F.lit(dist_m))

    if kind == "geo_bounding_box":
        # {"geo_bounding_box": {"<field>": {"top_left": {...}, "bottom_right": {...}}}}
        # (no dateline wrap: left <= right assumed, like a plain range)
        field, spec = _one(body)
        tl, br = spec["top_left"], spec["bottom_right"]
        c = F.col(resolve(field))
        lat, lon = c.getField("lat"), c.getField("lon")
        return _nn(
            (lat <= F.lit(float(tl["lat"])))
            & (lat >= F.lit(float(br["lat"])))
            & (lon >= F.lit(float(tl["lon"])))
            & (lon <= F.lit(float(br["lon"])))
        )

    raise ValueError(f"unsupported ES query kind {kind!r}")


_EARTH_RADIUS_M = 6371008.7714  # ES GeoUtils.EARTH_MEAN_RADIUS


_DIST_UNITS_M = {
    "mm": 0.001, "cm": 0.01, "m": 1.0, "km": 1000.0,
    "in": 0.0254, "ft": 0.3048, "yd": 0.9144, "mi": 1609.344,
    "nmi": 1852.0, "nm": 1852.0,
}


def _parse_distance(s) -> float:
    """ES distance string ('1500km', '2.5mi', bare meters) -> meters."""
    if isinstance(s, (int, float)):
        return float(s)
    m = re.fullmatch(r"\s*([0-9.]+)\s*([a-zA-Z]*)\s*", str(s))
    if not m:
        raise ValueError(f"unparsable distance {s!r}")
    val, unit = float(m.group(1)), (m.group(2) or "m").lower()
    if unit not in _DIST_UNITS_M:
        raise ValueError(f"unsupported distance unit {unit!r}")
    return val * _DIST_UNITS_M[unit]


def _haversine_m(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in meters (haversine, double precision)."""
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = F.radians(lat2 - lat1) / 2
    dl = F.radians(lon2 - lon1) / 2
    a = F.sin(dp) * F.sin(dp) + F.cos(p1) * F.cos(p2) * F.sin(dl) * F.sin(dl)
    # clamp: float overshoot past 1.0 near antipodal points would turn
    # asin into NaN and silently drop the row from any filter
    return F.lit(2.0 * _EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))
