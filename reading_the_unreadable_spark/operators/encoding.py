"""Mojibake repair: undo the classic UTF-8-read-as-Latin-1 double
encoding ("cafÃ©" -> "café") as a pure JVM projection.

Web corpora are full of this: a page was UTF-8, some layer decoded it
as ISO-8859-1, and the re-encoded result shows two-character sequences
like "Ã©" wherever an accented letter belonged.  The repair is
``decode(encode(text, 'ISO-8859-1'), 'UTF-8')`` — reconstruct the
original bytes, then read them correctly.  (The reference pipeline
normalizes OCR artifacts — ligatures, long-s — in
``analysis_functions.py:147-194`` but never sees transport mojibake
because its inputs are image-derived; a crawl pipeline hits it
constantly.)

Spark 4's ``encode``/``decode`` are STRICT (MALFORMED_CHARACTER_CODING
on unmappable input), so the repair is gated behind a detector regex
that only matches strings which are provably safe to round-trip:

- every character is ASCII, or part of a two-char sequence
  ``[\u00C2\u00C3][\u0080-\u00BF]`` — the Latin-1 spelling of a two-byte UTF-8
  sequence for a code point in U+0080..U+00FF;
- at least one such sequence is present.

That gate guarantees (a) ``encode(_, 'ISO-8859-1')`` cannot fail (all
chars <= U+00FF) and (b) the resulting bytes are valid UTF-8, so the
strict decode cannot fail either.  Windows-1252 mojibake that uses
characters outside Latin-1 (€, curly quotes) is NOT repaired by the
JVM path — Spark's charset whitelist has no cp1252 — and passes
through unchanged; the ``was_mojibake`` flag lets callers quarantine
what the gate skipped.

``fix_mojibake_cp1252`` closes that dialect with an Arrow-vectorized
pandas UDF (Python has the cp1252 codec the JVM whitelist lacks): a
string is repaired iff every character maps back into cp1252 AND the
recovered bytes are STRICTLY valid UTF-8 containing a multi-byte
sequence — so clean text, and mojibake whose recovered bytes aren't
really UTF-8, pass through untouched.  This is the slow path by
design: run the JVM ``fix_mojibake`` first and point the UDF only at
rows it flagged 0 (the ``only_where`` arg does exactly that).

Zero shuffles on either path, idempotent (repaired text contains real
non-ASCII letters neither gate matches... unless the original text was
itself doubly-double-encoded, in which case each application peels one
layer).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ASCII chars freely; non-ASCII only as C2/C3 + continuation pairs.
# Possessive quantifier: no backtracking blow-up on long ASCII runs.
_MOJI_GATE = "^(?:[\\x00-\\x7F]|[\u00C2\u00C3][\u0080-\u00BF])*+$"


def fix_mojibake(df: DataFrame, col: str = "text") -> DataFrame:
    """Repair Latin-1 mojibake in ``col`` in place and add an int
    ``was_mojibake`` flag column (1 = the gate matched and the text was
    round-tripped).  Strings that are pure ASCII, already-correct
    UTF-8, or an unrepairable mojibake dialect pass through unchanged
    with flag 0."""
    c = F.col(col)
    is_moji = c.isNotNull() & c.rlike(_MOJI_GATE) & c.rlike("[ÂÃ]")
    # flag FIRST: the repair below overwrites `col`, and a flag computed
    # against the repaired text would always read 0
    flagged = df.withColumn("was_mojibake", is_moji.cast("int"))
    return flagged.withColumn(
        col,
        F.when(
            F.col("was_mojibake") == 1,
            F.decode(F.encode(c, "ISO-8859-1"), "UTF-8"),
        ).otherwise(c),
    )


def _repair_cp1252(s):
    """One string: undo UTF-8-read-as-cp1252, or return None if the
    string is not provably that dialect.  Strictness is the correctness
    argument: encode must succeed (every char round-trips into cp1252)
    and the recovered bytes must decode as strict UTF-8 with at least
    one non-ASCII (multi-byte) character — plain ASCII and genuine
    UTF-8-only text both fail one of the two conditions."""
    try:
        raw = s.encode("cp1252")
    except UnicodeEncodeError:
        return None
    if raw.isascii():
        return None
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return None


def fix_mojibake_cp1252(
    df: DataFrame, col: str = "text", only_where=None
) -> DataFrame:
    """Repair Windows-1252 mojibake ("â€”" -> "—") in ``col`` in place
    and add an int ``was_mojibake_cp1252`` flag.  Arrow-vectorized
    pandas UDF (the JVM charset whitelist has no cp1252); pass
    ``only_where`` (a Column predicate, e.g. ``F.col('was_mojibake') ==
    0``) to skip rows the cheap JVM path already handled."""
    from pyspark.sql import types as T

    @F.pandas_udf(T.StringType())
    def _fix(s: pd.Series) -> pd.Series:
        # vectorized over the Arrow batch; non-candidates map to None
        return s.map(lambda v: _repair_cp1252(v) if isinstance(v, str) else None)

    c = F.col(col)
    gate = c.isNotNull()
    if only_where is not None:
        gate = gate & only_where
    repaired = F.when(gate, _fix(c)).otherwise(F.lit(None))
    return df.withColumn("__cp1252_fix", repaired).select(
        *[
            F.coalesce(F.col("__cp1252_fix"), c).alias(col)
            if f.name == col
            else F.col(f.name)
            for f in df.schema.fields
        ],
        F.col("__cp1252_fix").isNotNull().cast("int").alias("was_mojibake_cp1252"),
    )
