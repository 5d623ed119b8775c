"""Content normalization + sha256 fingerprinting.

Per BASELINE.json input_hint, all row-level content work runs through
vectorized pandas/Arrow UDFs — no per-row Python UDFs. The same pure-pandas
kernels are reused by the test oracle so engine and oracle share one
definition of "normalized content".

The reference never implements its advertised signature validation
(/root/reference/README.md architecture diagram mentions it; no code does it)
— the sha256 fingerprint is our verifiable stand-in, and the per-row
invariant the replay tests assert.
"""

from __future__ import annotations

import hashlib
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


# ---------------------------------------------------------------------------
# pandas kernels (shared by the Spark UDFs and the pure-pandas oracle)
# ---------------------------------------------------------------------------

def normalize_series(s: pd.Series) -> pd.Series:
    """NFC-normalize and canonicalize newlines. Null-safe, vectorized."""
    out = s.str.replace("\r\n", "\n", regex=False)
    mask = out.notna()
    if mask.any():
        out.loc[mask] = [unicodedata.normalize("NFC", x) for x in out.loc[mask]]
    return out


def sha256_series(s: pd.Series) -> pd.Series:
    """sha256 hex digest of utf-8 bytes; None stays None."""
    return s.map(lambda x: hashlib.sha256(x.encode("utf-8")).hexdigest(), na_action="ignore")


def fingerprint_series(s: pd.Series) -> pd.Series:
    return sha256_series(normalize_series(s))


# ---------------------------------------------------------------------------
# Spark-side vectorized UDFs (Arrow batches)
# ---------------------------------------------------------------------------

# NB: the UDF bodies are self-contained (locals + stdlib only) so cloudpickle
# ships them by value — executor Python workers never import this module
# (whose pyspark imports would add seconds of cold-start per worker).

@pandas_udf(StringType())
def normalize_content(s: pd.Series) -> pd.Series:  # pragma: no cover (runs on executors)
    import unicodedata as _ud

    out = s.str.replace("\r\n", "\n", regex=False)
    mask = out.notna()
    if mask.any():
        out.loc[mask] = [_ud.normalize("NFC", x) for x in out.loc[mask]]
    return out


@pandas_udf(StringType())
def content_sha256(s: pd.Series) -> pd.Series:  # pragma: no cover (runs on executors)
    import hashlib as _hl
    import unicodedata as _ud

    out = s.str.replace("\r\n", "\n", regex=False)
    mask = out.notna()
    if mask.any():
        out.loc[mask] = [
            _hl.sha256(_ud.normalize("NFC", x).encode("utf-8")).hexdigest()
            for x in out.loc[mask]
        ]
    return out


def sha256_raw(col: Column) -> Column:
    """JVM-side sha256 (no normalization) — whole-stage-codegen'd; use when
    the input is already normalized."""
    return F.sha2(col, 256)
