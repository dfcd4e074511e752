"""Op-dict DSL → DataFrame compiler (SURVEY.md §2.10 O4).

The reference's background jobs interpret a micro logical plan — a JSON
list of operation dicts (`/root/reference/src/climate_pipeline/tasks/
celery_tasks.py:210-231`: slice_time / slice_region / resample /
compute_mean) — over a lazily-opened dataset, then write the result.
This module compiles the same op dicts into DataFrame transforms: the
compiled function is pure, the plan stays lazy until an action, and
Catalyst sees the whole composed plan (so a slice_time after a resample
still pushes the scan predicate down where algebraically legal).

Supported ops (a superset of the reference's four):

  {"op": "slice_time",   "column": ts, "start": s, "end": e}
  {"op": "slice_region", "bounds": {col: [lo, hi], ...}}
  {"op": "select",       "columns": [...]}
  {"op": "filter",       "expr": "<SQL boolean expr>"}
  {"op": "with_column",  "name": n, "expr": "<SQL expr>"}
  {"op": "resample",     "freq": "month|year|day|...", "column": ts,
                         "keys": [...], "aggs": {out: "mean|sum|min|max|count(col)"}}
  {"op": "compute_mean", "keys": [...], "values": [...]}

Pipeline verbs (engine additions — the dedup/sampling/sharding steps a
training-data job plans the same declarative way):

  {"op": "dedup_exact",  "id": id_col, "text": text_col}
  {"op": "sample",       "id": id_col, "fraction": f, "salt": "..."}
  {"op": "split",        "id": id_col, "weights": {name: w, ...},
                         "keep": "train"}
  {"op": "shard",        "id": id_col, "n_shards": n, "salt": "..."}
  {"op": "nfc_normalize", "text": text_col, "form": "NFC|NFKC|..."}
  {"op": "lm_filter",    "id": id_col, "text": text_col,
                         "nll_threshold": 3.4}
  {"op": "gopher_filter", "id": id_col, "text": text_col,
                         "min_words": 50}
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGG_FNS = {"mean": F.avg, "avg": F.avg, "sum": F.sum, "min": F.min,
            "max": F.max, "count": F.count}


def _parse_agg(spec: str):
    """'mean(l_quantity)' → (F.avg, 'l_quantity')."""
    fn_name, _, rest = spec.partition("(")
    col = rest.rstrip(")")
    if fn_name not in _AGG_FNS:
        raise ValueError(f"unknown aggregate {fn_name!r}; "
                         f"expected one of {sorted(_AGG_FNS)}")
    return _AGG_FNS[fn_name], col


def _apply_op(df: DataFrame, op: dict) -> DataFrame:
    kind = op.get("op")
    if kind == "slice_time":            # ref celery_tasks.py:214-216
        return df.where(F.col(op["column"]).between(op["start"], op["end"]))
    if kind == "slice_region":          # ref celery_tasks.py:217-222
        for col, (lo, hi) in op["bounds"].items():
            df = df.where(F.col(col).between(lo, hi))
        return df
    if kind == "select":
        missing = [c for c in op["columns"] if c not in df.columns]
        if missing:
            raise ValueError(f"select: unknown columns {missing}")
        return df.select(*op["columns"])
    if kind == "filter":
        return df.where(F.expr(op["expr"]))
    if kind == "with_column":
        return df.withColumn(op["name"], F.expr(op["expr"]))
    if kind == "resample":              # ref celery_tasks.py:223-227
        trunc = F.date_trunc(op.get("freq", "month"),
                             F.col(op["column"])).alias("period")
        keys = [trunc, *op.get("keys", ())]
        aggs = [fn(col).alias(out)
                for out, (fn, col) in
                ((o, _parse_agg(s)) for o, s in op["aggs"].items())]
        return df.groupBy(*keys).agg(*aggs)
    if kind == "compute_mean":          # ref celery_tasks.py:228-230
        aggs = [F.avg(v).alias(f"avg_{v}") for v in op["values"]]
        keys = op.get("keys", ())
        return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)
    if kind == "dedup_exact":
        from ..operators.dedup import exact_dedup
        keep = exact_dedup(df, op["text"], op["id"]) \
            .select(F.col("keep_id").alias(op["id"]))
        return df.join(keep, op["id"], "left_semi")
    if kind == "sample":
        from ..operators.sampling import deterministic_sample
        return deterministic_sample(df, op["id"], op["fraction"],
                                    salt=op.get("salt", ""))
    if kind == "split":
        from ..operators.sampling import deterministic_split
        out = deterministic_split(df, op["id"], op["weights"])
        return out.where(F.col("split") == op["keep"]).drop("split")
    if kind == "shard":
        from ..operators.sampling import training_shards
        return training_shards(df, op["id"], op["n_shards"],
                               salt=op.get("salt", ""))
    if kind == "lm_filter":
        from ..operators.text import lm_perplexity
        keep = (lm_perplexity(df, op["text"], op["id"],
                              op.get("nll_threshold", 3.4))
                .where("keep").select(op["id"]))
        return df.join(keep, op["id"], "left_semi")
    if kind == "nfc_normalize":
        from ..operators.text import nfc_normalize
        out = nfc_normalize(df, op["text"], form=op.get("form", "NFC"),
                            alias="__norm")
        return (out.withColumn(op["text"], F.col("__norm"))
                   .drop("__norm", "n_chars_before", "n_chars_after",
                         "changed"))
    if kind == "gopher_filter":
        from ..operators.text import GOPHER_STOPWORDS, gopher_rules
        keep = (gopher_rules(df, op["text"], op["id"],
                             min_words=op.get("min_words", 50),
                             max_words=op.get("max_words", 100_000),
                             min_stop_hits=op.get("min_stop_hits", 2),
                             stopwords=tuple(op.get(
                                 "stopwords", GOPHER_STOPWORDS)))
                .where("pass").select(op["id"]))
        return df.join(keep, op["id"], "left_semi")
    raise ValueError(f"unknown op {kind!r}")


KNOWN_OPS = frozenset({
    "slice_time", "slice_region", "select", "filter", "with_column",
    "resample", "compute_mean", "dedup_exact", "sample", "split",
    "shard", "lm_filter", "nfc_normalize", "gopher_filter",
})


def compile_ops(ops: Sequence[dict]) -> Callable[[DataFrame], DataFrame]:
    """Compile an op list into a single DataFrame → DataFrame transform.
    Validation of op names/aggregates happens at compile time; column
    validation at bind time (first call)."""
    for op in ops:
        if "op" not in op:
            raise ValueError(f"op dict missing 'op' key: {op}")
        if op["op"] not in KNOWN_OPS:
            # a typo must fail BEFORE the job runs earlier ops/loads —
            # that is the whole point of the up-front compile
            raise ValueError(f"unknown op {op['op']!r} "
                             f"(known: {sorted(KNOWN_OPS)})")
        if op["op"] == "resample":
            for spec in op.get("aggs", {}).values():
                _parse_agg(spec)

    def transform(df: DataFrame) -> DataFrame:
        for op in ops:
            df = _apply_op(df, op)
        return df

    return transform


def run_ops(df: DataFrame, ops: Sequence[dict]) -> DataFrame:
    return compile_ops(ops)(df)
