"""Model-based document scoring hook (beyond-reference).

The curation pipeline's second quality stage: after the cheap native
heuristics (text_stats), a learned classifier scores each document —
fastText-style quality models, toxicity filters, domain classifiers. The
Spark shape is an Arrow-batched ``mapInPandas`` (model loaded once per
worker via the iterator pattern, never per row); the model itself is
pluggable:

- ``model="fake"`` (default): a deterministic hash-derived pseudo-score —
  md5 of the normalized text, first 8 hex chars mod 1e6, scaled to [0, 1).
  Exactly reproducible in SQL, so the ENTIRE Python batch path is
  oracle-checked cross-engine (the same trick as multimodal_features_long),
  and pipeline tests get stable content-dependent scores.
- ``model="fasttext"``: gated on an importable ``fasttext`` package +
  ``model_path`` (not present in this container) — the production slot.

Scale: one scan, Arrow batches. The per-document work (normalize + hash
for the fake; ``model.predict`` for the real) is a per-row Python loop by
nature — that is the cost profile of ANY model-scoring stage, and the
Arrow batching amortizes the transfer, not the inference. Batch size
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, types as T

try:  # real classifier is optional — not present in the test container
    import fasttext as _fasttext  # type: ignore[import-not-found]
except ImportError:  # pragma: no cover - exercised only where fasttext exists
    _fasttext = None

_NORM_RE = re.compile(r"[^a-z0-9]+")


def _scored_schema(id_col: str) -> T.StructType:
    return T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("model_score", T.DoubleType()),
        ]
    )


def _normalize(text: str) -> str:
    """Byte-identical twin of the engine's normalize_text / _NORM_SQL
    contract: lowercase, non-alphanumerics to spaces, trim."""
    return _NORM_RE.sub(" ", text.lower()).strip()


def fake_model_score(text: str) -> float:
    """Deterministic pseudo-score in [0, 1): md5(norm)[:8] as int, mod 1e6,
    / 1e6 — the SQL-reproducible stand-in for a learned quality model."""
    digest = hashlib.md5(_normalize(text).encode("utf-8")).hexdigest()
    return (int(digest[:8], 16) % 1_000_000) / 1_000_000


def score_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model: str = "fake",
    model_path: str | None = None,
) -> DataFrame:
    """(``id_col``, model_score) via Arrow-batched ``mapInPandas``. The
    iterator form loads the model once per task, not per batch or row.
    NULL text propagates a NULL score (the NULL-in → NULL-out contract the
    oracle's ``md5(NULL)`` follows; curation filters NULLs upstream)."""
    if model == "fasttext" and _fasttext is None:
        raise NotImplementedError(
            "fasttext unavailable in this environment; use model='fake' "
            "(deterministic, oracle-checked) for pipeline testing"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        clf = None
        if model == "fasttext":  # pragma: no cover - needs the real package
            clf = _fasttext.load_model(model_path)
        for pdf in batches:
            texts = pdf[text_col]
            if clf is not None:  # pragma: no cover
                scores = [
                    None
                    if t is None
                    else float(clf.predict(t.replace("\n", " "), k=1)[1][0])
                    for t in texts
                ]
            else:
                scores = [None if t is None else fake_model_score(t) for t in texts]
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "model_score": scores}
            )

    return df.mapInPandas(run, _scored_schema(id_col))
