r"""Unicode text normalization (control strip, whitespace collapse, NFC).

Raw web text arrives in every encoding accident the web can produce:
decomposed accents (e + U+0301 vs precomposed U+00E9) that break exact
dedup and tokenizer merges, C0 control bytes from broken CMSes, and
whitespace soup. Pretraining pipelines canonicalize before ANY
hash-keyed operator (dedup.py's h60 fingerprints, minhash shingles,
span_dedup blocks treat 'café' and 'café' as different documents
otherwise). The reference scrapes German city/street names through a
rendering browser and never normalizes (`gsub` cleanup only —
`/root/reference/app/controllers/cars_controller.rb:178-249`); at
corpus scale, normalization is the engine's job: L38 in SURVEY §2.10.

Split design — the repo-wide "UDFs are the slow path" rule:
  - `clean_text`: control-char strip + whitespace collapse + trim as
    pure codegen regexp_replace chain (JVM, fused into the scan).
  - `nfc`: Unicode NFC composition — genuinely impossible in built-in
    Spark SQL (no normalization function through 4.x), so an
    Arrow-batched pandas UDF over `unicodedata.normalize` (the same
    tables every engine uses; DuckDB's nfc_normalize replays it, which
    is what makes the driver query oracle-able).
  - `normalize_text` = nfc(clean_text(col)) — clean first, so the UDF
    sees already-collapsed strings (less Python-side work).

NFC (not NFKC): NFC is the lossless canonical composition — safe for
fingerprinting. NFKC folds compatibility characters (ligatures,
fullwidth forms) — a lossy editorial choice left to callers via
`form="NFKC"`.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CTRL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def clean_text(col) -> Column:
    """Codegen cleanup: strip C0/DEL control chars (keeping \t \n \r as
    whitespace), collapse all whitespace runs to one space, trim."""
    c = col if isinstance(col, Column) else F.col(col)
    c = F.regexp_replace(c, _CTRL_RE, "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def nfc(col, form: str = "NFC") -> Column:
    """Unicode normalization as an Arrow-batched pandas UDF (no built-in
    exists). `form` in NFC/NFD/NFKC/NFKD."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"bad form {form!r}")

    @F.pandas_udf(T.StringType())
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(lambda v: None if v is None else unicodedata.normalize(form, v))

    return _norm(col if isinstance(col, Column) else F.col(col))


def normalize_text(col, form: str = "NFC") -> Column:
    """Full canonicalization: clean_text then Unicode-compose."""
    return nfc(clean_text(col), form=form)
