"""ES pipeline aggregations over bucketed frames.

Parent aggregations (date_histogram / histogram / terms) reduce the corpus
to a bucket frame; pipeline aggregations then derive per-bucket series
metrics from that frame — the Kibana/observability workload
(Elasticsearch "pipeline aggregations": cumulative_sum, derivative,
serial_diff, moving_fn, bucket_script, bucket_selector, bucket_sort, and
the sibling avg/sum/min/max/stats_bucket).

Scale shape: a pipeline runs on the ALREADY-REDUCED bucket frame, never
the raw corpus — exactly where ES runs it (the coordinating node's reduce
phase, over the merged bucket list). Bucket counts are bounded by
|time range| / interval, so the unpartitioned window's single-partition
sort is the same coordinator-sized work ES does; when the frame carries a
series key (one pipeline per event_type / per term), pass it as
``partition_by`` and the window parallelizes per series — the 100 TB
shape for multi-series dashboards.

Scripts (bucket_script / bucket_selector) accept a painless-lite
arithmetic subset — ``params.x`` path references, numbers, + - * / %,
comparisons, == !=, && || !, parentheses, unary minus — compiled to a
Spark Column expression (JVM-side, zero Python on the data path). No
other painless surface is accepted; unsupported syntax raises
``PipelineError`` rather than mis-executing.

Reference analogue: the reference's query-log tooling derives the same
series shapes (QPS over time, deltas) driver-side from reduced
experiment tables (/root/reference/src/Scripts); here they are
declarative window expressions over the bucket frame.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class PipelineError(ValueError):
    """Unsupported or malformed pipeline aggregation spec."""


# ---------------------------------------------------------------------------
# painless-lite script compiler

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?)"
    r"|(?P<ident>params\.[A-Za-z_]\w*|[A-Za-z_]\w*)"
    r"|(?P<op>&&|\|\||==|!=|>=|<=|[-+*/%()><!]))"
)


def _tokenize(script: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(script):
        m = _TOKEN_RE.match(script, pos)
        if m is None or m.end() == pos:
            rest = script[pos:].strip()
            if not rest:
                break
            raise PipelineError(f"bad script syntax at {rest[:20]!r}")
        if m.lastgroup == "num":
            out.append(("num", m.group("num")))
        elif m.lastgroup == "ident":
            out.append(("ident", m.group("ident")))
        else:
            out.append(("op", m.group("op")))
        pos = m.end()
    return out


class _ScriptParser:
    """Recursive-descent painless-lite → Spark Column. Grammar (loosest
    binding first): or → and → cmp → add → mul → unary → atom."""

    def __init__(self, tokens: list[tuple[str, str]], params: dict):
        self.toks = tokens
        self.i = 0
        self.params = params

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _eat(self, val=None):
        kind, tok = self._peek()
        if kind is None or (val is not None and tok != val):
            raise PipelineError(f"expected {val!r}, got {tok!r}")
        self.i += 1
        return tok

    def parse(self):
        col = self._or()
        if self.i != len(self.toks):
            raise PipelineError(f"trailing script tokens: {self.toks[self.i:]}")
        return col

    def _or(self):
        col = self._and()
        while self._peek() == ("op", "||"):
            self._eat()
            col = col | self._and()
        return col

    def _and(self):
        col = self._cmp()
        while self._peek() == ("op", "&&"):
            self._eat()
            col = col & self._cmp()
        return col

    def _cmp(self):
        col = self._add()
        kind, tok = self._peek()
        if kind == "op" and tok in (">", ">=", "<", "<=", "==", "!="):
            self._eat()
            rhs = self._add()
            return {
                ">": col > rhs, ">=": col >= rhs, "<": col < rhs,
                "<=": col <= rhs, "==": col == rhs, "!=": col != rhs,
            }[tok]
        return col

    def _add(self):
        col = self._mul()
        while True:
            kind, tok = self._peek()
            if kind == "op" and tok in ("+", "-"):
                self._eat()
                rhs = self._mul()
                col = col + rhs if tok == "+" else col - rhs
            else:
                return col

    def _mul(self):
        col = self._unary()
        while True:
            kind, tok = self._peek()
            if kind == "op" and tok in ("*", "/", "%"):
                self._eat()
                rhs = self._unary()
                col = col * rhs if tok == "*" else (
                    col / rhs if tok == "/" else col % rhs
                )
            else:
                return col

    def _unary(self):
        kind, tok = self._peek()
        if kind == "op" and tok == "-":
            self._eat()
            return -self._unary()
        if kind == "op" and tok == "!":
            self._eat()
            return ~self._unary()
        return self._atom()

    def _atom(self):
        kind, tok = self._peek()
        if kind == "num":
            self._eat()
            return F.lit(float(tok) if "." in tok else int(tok))
        if kind == "ident":
            self._eat()
            name = tok[7:] if tok.startswith("params.") else tok
            if name not in self.params:
                raise PipelineError(
                    f"script references {name!r}, not in buckets_path "
                    f"{sorted(self.params)}"
                )
            return F.col(self.params[name])
        if kind == "op" and tok == "(":
            self._eat()
            col = self._or()
            self._eat(")")
            return col
        raise PipelineError(f"bad script atom {tok!r}")


def compile_script(script: str, params: dict):
    """painless-lite expression → Spark Column; ``params`` maps script
    names to frame column names (ES buckets_path)."""
    if not isinstance(script, str) or not script.strip():
        raise PipelineError("script must be a non-empty string")
    return _ScriptParser(_tokenize(script), params).parse()


class _SqlScriptParser(_ScriptParser):
    """The same grammar emitting a SQL expression string instead of a
    Column — the oracle's mirror of compile_script. Operator semantics
    match across engines on double operands (/ is float division, % is
    fmod in both Spark and DuckDB)."""

    def _or(self):
        s = self._and()
        while self._peek() == ("op", "||"):
            self._eat()
            s = f"({s} OR {self._and()})"
        return s

    def _and(self):
        s = self._cmp()
        while self._peek() == ("op", "&&"):
            self._eat()
            s = f"({s} AND {self._cmp()})"
        return s

    def _cmp(self):
        s = self._add()
        kind, tok = self._peek()
        if kind == "op" and tok in (">", ">=", "<", "<=", "==", "!="):
            self._eat()
            op = {"==": "=", "!=": "<>"}.get(tok, tok)
            return f"({s} {op} {self._add()})"
        return s

    def _add(self):
        s = self._mul()
        while True:
            kind, tok = self._peek()
            if kind == "op" and tok in ("+", "-"):
                self._eat()
                s = f"({s} {tok} {self._mul()})"
            else:
                return s

    def _mul(self):
        s = self._unary()
        while True:
            kind, tok = self._peek()
            if kind == "op" and tok in ("*", "/", "%"):
                self._eat()
                s = f"({s} {tok} {self._unary()})"
            else:
                return s

    def _unary(self):
        kind, tok = self._peek()
        if kind == "op" and tok == "-":
            self._eat()
            return f"(- {self._unary()})"
        if kind == "op" and tok == "!":
            self._eat()
            return f"(NOT {self._unary()})"
        return self._atom()

    def _atom(self):
        kind, tok = self._peek()
        if kind == "num":
            self._eat()
            return repr(float(tok)) if "." in tok else tok
        if kind == "ident":
            self._eat()
            name = tok[7:] if tok.startswith("params.") else tok
            if name not in self.params:
                raise PipelineError(
                    f"script references {name!r}, not in buckets_path "
                    f"{sorted(self.params)}"
                )
            return self.params[name]
        if kind == "op" and tok == "(":
            self._eat()
            s = self._or()
            self._eat(")")
            return f"({s})"
        raise PipelineError(f"bad script atom {tok!r}")


def compile_script_sql(script: str, params: dict) -> str:
    """painless-lite expression → ANSI-SQL expression string; ``params``
    maps script names to SQL expressions. Same grammar and rejection
    behavior as compile_script — the DuckDB-oracle mirror."""
    if not isinstance(script, str) or not script.strip():
        raise PipelineError("script must be a non-empty string")
    return _SqlScriptParser(_tokenize(script), params).parse()


# ---------------------------------------------------------------------------
# pipeline application

_MOVING_FNS = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}

# ES moving_fn script names → fn keys (MovingFunctions.* helpers)
_MOVING_SCRIPTS = {
    "MovingFunctions.unweightedAvg(values)": "avg",
    "MovingFunctions.sum(values)": "sum",
    "MovingFunctions.min(values)": "min",
    "MovingFunctions.max(values)": "max",
}


def _path_col(df: DataFrame, path) -> str:
    if not isinstance(path, str) or path not in df.columns:
        raise PipelineError(
            f"buckets_path {path!r} is not a bucket column "
            f"(have {df.columns})"
        )
    return path


def apply_pipeline(
    buckets: DataFrame,
    order_by: Sequence[str],
    specs: Sequence[tuple[str, str, dict]],
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Apply pipeline aggregations, in order, to a bucket frame.

    ``specs`` is [(out_name, kind, conf), ...]; later specs may reference
    earlier outputs (ES buckets_path chaining). ``order_by`` is the bucket
    key (time ascending); ``partition_by`` optionally splits independent
    series (each series gets its own pipeline — the parallel shape).
    """
    w = Window.partitionBy(*partition_by).orderBy(*[F.col(c) for c in order_by])
    df = buckets
    for out, kind, conf in specs:
        conf = dict(conf)
        if kind == "cumulative_sum":
            col = _path_col(df, conf.pop("buckets_path", None))
            df = df.withColumn(
                out,
                F.sum(col).over(w.rowsBetween(Window.unboundedPreceding, 0)),
            )
        elif kind == "derivative":
            col = _path_col(df, conf.pop("buckets_path", None))
            # ES omits the derivative on the first bucket — null here
            df = df.withColumn(out, F.col(col) - F.lag(col, 1).over(w))
        elif kind == "serial_diff":
            col = _path_col(df, conf.pop("buckets_path", None))
            lag = int(conf.pop("lag", 1))
            if lag < 1:
                raise PipelineError("serial_diff lag must be >= 1")
            df = df.withColumn(out, F.col(col) - F.lag(col, lag).over(w))
        elif kind == "moving_fn":
            col = _path_col(df, conf.pop("buckets_path", None))
            window = int(conf.pop("window", 0))
            if window < 1:
                raise PipelineError("moving_fn needs window >= 1")
            shift = int(conf.pop("shift", 0))
            script = conf.pop("script", None)
            fn = conf.pop("fn", None) or _MOVING_SCRIPTS.get(script)
            if fn not in _MOVING_FNS:
                raise PipelineError(
                    f"moving_fn supports fns {sorted(_MOVING_FNS)} or "
                    f"scripts {sorted(_MOVING_SCRIPTS)}, got "
                    f"fn={fn!r} script={script!r}"
                )
            # ES window semantics: shift=0 → the `window` buckets strictly
            # BEFORE the current one; shift=window → trailing-inclusive
            df = df.withColumn(
                out,
                _MOVING_FNS[fn](col).over(
                    w.rowsBetween(shift - window, shift - 1)
                ),
            )
        elif kind == "bucket_script":
            paths = conf.pop("buckets_path", None)
            if not isinstance(paths, dict) or not paths:
                raise PipelineError("bucket_script needs buckets_path {name: col}")
            params = {n: _path_col(df, c) for n, c in paths.items()}
            df = df.withColumn(out, compile_script(conf.pop("script", ""), params))
        elif kind == "bucket_selector":
            paths = conf.pop("buckets_path", None)
            if not isinstance(paths, dict) or not paths:
                raise PipelineError("bucket_selector needs buckets_path {name: col}")
            params = {n: _path_col(df, c) for n, c in paths.items()}
            # null-safe: a null path value fails the predicate (ES skips
            # buckets with missing paths unless gap_policy says otherwise)
            df = df.filter(compile_script(conf.pop("script", ""), params))
        elif kind == "bucket_sort":
            sort = conf.pop("sort", [])
            size = conf.pop("size", None)
            frm = int(conf.pop("from", 0))
            cols = []
            for s in sort:
                if isinstance(s, str):
                    s = {s: "asc"}
                if not isinstance(s, dict) or len(s) != 1:
                    raise PipelineError(f"bad bucket_sort entry {s!r}")
                (name, order), = s.items()
                direction = order["order"] if isinstance(order, dict) else order
                if direction not in ("asc", "desc"):
                    raise PipelineError(f"bad sort order {direction!r}")
                c = F.col(_path_col(df, name))
                cols.append(c.desc() if direction == "desc" else c.asc())
            # deterministic total order: bucket key breaks ties
            cols.extend(F.col(c).asc() for c in order_by)
            df = df.orderBy(*cols)
            if frm:
                df = df.offset(frm)
            if size is not None:
                df = df.limit(int(size))
        else:
            raise PipelineError(f"unsupported pipeline agg kind: {kind!r}")
        if conf:
            raise PipelineError(f"unsupported {kind} options: {sorted(conf)}")
    return df


# ---------------------------------------------------------------------------
# sibling (bucket-metric) aggregations — one scalar over the whole series

def sibling_bucket(buckets: DataFrame, kind: str, path: str) -> DataFrame:
    """ES avg/sum/min/max/stats_bucket: a single-row frame summarizing one
    metric across every bucket (the parent-level sibling output)."""
    col = _path_col(buckets, path)
    if kind == "stats_bucket":
        return buckets.agg(
            F.count(col).alias("count"),
            F.min(col).alias("min"),
            F.max(col).alias("max"),
            F.sum(col).alias("sum"),
            F.avg(col).alias("avg"),
        )
    fns = {"avg_bucket": F.avg, "sum_bucket": F.sum,
           "min_bucket": F.min, "max_bucket": F.max}
    if kind not in fns:
        raise PipelineError(f"unsupported sibling agg {kind!r}")
    return buckets.agg(fns[kind](col).alias("value"))
