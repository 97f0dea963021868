"""Configurable ingest-time quality filters — engine extension; the
reference's only ingest guards are the hardcoded F1 table filter and F2
empty-text skip (pipeline.go:171-196). Production CDC-to-vector
deployments need the corpus-quality rules at ingestion too ("don't
embed garbage"): this module makes the round-7 corpus operators
(PII scrub, token bounds, lexical diversity, language allowlist, regex
drop) available as a declarative per-pipeline filter chain, configured
in YAML next to the reference's own knobs.

Semantics follow F2 exactly (the reference's precedent for a failing
upsert, pipeline.go:191-196): an upsert that fails a drop-filter is
SKIPPED — the batch drops the row and existing collection state stays;
DELETES ALWAYS PASS (a delete must reach the sink no matter how
garbage the deleted row's text was). Scrub filters rewrite the text
in place rather than dropping.

Everything is scan-stage JVM expression work (the d20/t2/t3 operator
expressions applied to the pipeline's ``text`` column) — the chain
adds zero shuffles and zero Python to the hot path.

YAML shape (engine extension; omit for reference parity):

    filters:
      - type: pii_scrub
      - type: min_tokens
        n: 5
      - type: lexical_diversity
        min_ratio: 0.3
      - type: lang
        allow: [en]
      - type: regex_drop
        pattern: "(?i)lorem ipsum"
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .envelope import OP_DELETE

FILTER_TYPES = (
    "pii_scrub",
    "min_tokens",
    "max_tokens",
    "lexical_diversity",
    "lang",
    "regex_drop",
)


@dataclass(frozen=True)
class FilterSpec:
    """One chain entry: a type from FILTER_TYPES plus its options."""

    type: str
    options: dict = field(default_factory=dict)

    def __post_init__(self):
        if self.type not in FILTER_TYPES:
            raise ValueError(
                f"unknown ingest filter type {self.type!r}; known: {FILTER_TYPES}"
            )


def _keep_condition(spec: FilterSpec, text: Column) -> Column:
    toks = F.split(text, " ")
    if spec.type == "min_tokens":
        return F.size(toks) >= int(spec.options.get("n", 1))
    if spec.type == "max_tokens":
        return F.size(toks) <= int(spec.options.get("n", 1 << 30))
    if spec.type == "lexical_diversity":
        ratio = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        return ratio >= float(spec.options.get("min_ratio", 0.0))
    if spec.type == "lang":
        allow = tuple(spec.options.get("allow", ()))
        # the t3 stopword heuristic (operators.text.lang_guess) inlined
        # on the pipeline's text column
        padded = F.concat(F.lit(" "), text, F.lit(" "))
        guess = F.when(
            padded.like("% the %") | padded.like("% a %"), "en"
        ).otherwise("other")
        return guess.isin(*allow) if allow else F.lit(True)
    if spec.type == "regex_drop":
        return ~text.rlike(str(spec.options.get("pattern", "$^")))
    raise ValueError(f"not a drop filter: {spec.type!r}")


def apply_ingest_filters(
    df: DataFrame,
    specs: tuple[FilterSpec, ...],
    text_col: str = "text",
    observe: list | None = None,
) -> DataFrame:
    """Apply the chain to a batch AFTER text extraction (P1) and the F2
    guard, BEFORE id derivation and embedding — so dropped rows never
    cost an embed call, and scrubbed text is what gets embedded,
    stored, and delivered.

    ``observe`` (optional): a list the caller owns; one
    ``(stage_name, Observation)`` pair is appended for the input and
    after each DROP stage, each counting surviving rows. The counts
    piggyback on whatever action executes the batch (zero extra jobs —
    the auto-compaction-counter lesson) and let the caller compute
    per-stage drop attribution (runner.boot surfaces them on
    /healthz)."""
    if not specs:
        return df
    from pyspark.sql import Observation

    def _observed(frame: DataFrame, name: str) -> DataFrame:
        if observe is None:
            return frame
        obs = Observation()
        observe.append((name, obs))
        return frame.observe(obs, F.count(F.lit(1)).alias("rows"))

    is_delete = F.col("op") == OP_DELETE
    df = _observed(df, "input")
    for i, spec in enumerate(specs):
        if spec.type == "pii_scrub":
            from ..operators.pii import redact

            df = df.withColumn(
                text_col,
                F.when(is_delete, F.col(text_col)).otherwise(
                    redact(F.col(text_col))
                ),
            )
        else:
            df = _observed(
                df.where(is_delete | _keep_condition(spec, F.col(text_col))),
                f"{i}_{spec.type}",
            )
    return df


def specs_from_raw(raw: list | tuple | None) -> tuple[FilterSpec, ...]:
    """YAML → FilterSpec chain: each entry is a dict with ``type`` plus
    its options inline (see module docstring)."""
    out = []
    for entry in raw or ():
        entry = dict(entry)
        ftype = entry.pop("type", "")
        out.append(FilterSpec(type=ftype, options=entry))
    return tuple(out)
