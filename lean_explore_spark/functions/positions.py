"""Byte-offset → line/column mapping (SURVEY.md §2.7 F14).

Rebuild of the reference's SourceFilePositionMapper semantics
(dev_tools/population/phase2_tasks.py:216-381): map UTF-8 BYTE spans
(the offsets Lean's AST emits) to 1-based line numbers, 0-based column
numbers, and 0-based character indices.

Semantics pinned by the reference (differentially tested):

* a byte offset landing MID-character floors to the character that
  contains it;
* offsets clamp into ``[0, total_bytes]``; ``end`` clamps to ≥ start;
* ``None``/negative/inverted spans → all-``None`` result;
* offset == total_bytes maps one past the last character (char index
  ``total_chars``, column = chars on the final line — 0 if the text
  ends with a newline);
* a zero-length span maps both endpoints to the start position.

Implementation is fresh and vectorized instead of the reference's
per-character line walk: UTF-8 character starts are the bytes with
``(b & 0xC0) != 0x80`` (non-continuation bytes), found in one numpy
pass; every query is then two ``searchsorted`` calls.  ``map_spans``
wraps it as an Arrow-batched Spark operator — one mapper per document
per batch, no shuffle.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

SpanDetails = Tuple[
    Optional[int],
    Optional[int],
    Optional[int],
    Optional[int],
    Optional[int],
    Optional[int],
]


class PositionMapper:
    """Pre-indexes one text; answers byte→(line, col, char) in O(log n)."""

    def __init__(self, text: str) -> None:
        data = text.encode("utf-8")
        b = np.frombuffer(data, dtype=np.uint8)
        # char k starts at byte char_starts[k] (non-continuation bytes)
        self.char_starts = np.flatnonzero((b & 0xC0) != 0x80)
        self.total_bytes = int(b.size)
        self.total_chars = int(self.char_starts.size)
        # line i (0-based) starts at byte line_start_bytes[i]; '\n' is
        # ASCII so its byte positions are exactly its char positions
        nl = np.flatnonzero(b == 0x0A)
        self.line_start_bytes = np.concatenate(
            [[0], nl + 1]
        ).astype(np.int64)
        # every line-start byte IS a char start (or total_bytes)
        self.line_start_chars = np.searchsorted(
            self.char_starts, self.line_start_bytes
        )

    def position(self, byte_offset: int) -> Tuple[int, int, int]:
        """(1-based line, 0-based col, 0-based char index) for a byte
        offset already clamped to [0, total_bytes]."""
        if byte_offset >= self.total_bytes:
            char_idx = self.total_chars
        else:
            char_idx = max(
                0,
                int(
                    np.searchsorted(
                        self.char_starts, byte_offset, side="right"
                    )
                )
                - 1,
            )
        line_idx = max(
            0,
            int(
                np.searchsorted(
                    self.line_start_bytes,
                    min(byte_offset, self.total_bytes),
                    side="right",
                )
            )
            - 1,
        )
        col = char_idx - int(self.line_start_chars[line_idx])
        return line_idx + 1, col, char_idx

    def convert_byte_span_to_details(
        self, byte_start: Optional[int], byte_end: Optional[int]
    ) -> SpanDetails:
        """(start_line, start_col, end_line, end_col, start_char_idx,
        end_char_idx) — exactly the reference's return contract."""
        if (
            byte_start is None
            or byte_end is None
            or byte_start < 0
            or byte_end < byte_start
        ):
            return None, None, None, None, None, None
        s = max(0, min(int(byte_start), self.total_bytes))
        e = max(s, min(int(byte_end), self.total_bytes))
        s_line, s_col, s_char = self.position(s)
        if e == s:
            return s_line, s_col, s_line, s_col, s_char, s_char
        e_line, e_col, e_char = self.position(e)
        return s_line, s_col, e_line, e_col, s_char, e_char


def map_spans(
    df,
    text_col: str = "text",
    start_col: str = "byte_start",
    end_col: str = "byte_end",
):
    """Spark operator: append (start_line, start_col, end_line,
    end_col, start_char_idx, end_char_idx) columns to a relation of
    (id..., text, byte_start, byte_end) rows.

    Narrow Arrow-batched map — one PositionMapper per distinct text per
    batch (the reference builds one mapper per source file and reuses
    it across that file's declarations; the per-batch dict mirrors
    that amortization).  At 100 TB this is shuffle-free and prunes to
    exactly the referenced columns."""
    import pandas as pd

    from lean_explore_spark.pyfiles import ensure_py_files

    ensure_py_files(df.sparkSession)
    out_fields = (
        "start_line",
        "start_col",
        "end_line",
        "end_col",
        "start_char_idx",
        "end_char_idx",
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from lean_explore_spark.functions.positions import PositionMapper

        for pdf in it:
            mappers: dict = {}
            cols: dict = {f: [] for f in out_fields}
            for text, s, e in zip(
                pdf[text_col], pdf[start_col], pdf[end_col]
            ):
                m = mappers.get(text)
                if m is None:
                    m = mappers[text] = PositionMapper(text)
                s = None if pd.isna(s) else int(s)
                e = None if pd.isna(e) else int(e)
                for f, v in zip(
                    out_fields, m.convert_byte_span_to_details(s, e)
                ):
                    cols[f].append(v)
            out = pdf.copy()
            for f in out_fields:
                out[f] = pd.array(cols[f], dtype="Int64")
            yield out

    schema = ", ".join(
        [f.name + " " + f.dataType.simpleString() for f in df.schema.fields]
        + [f"{f} bigint" for f in out_fields]
    )
    return df.mapInPandas(run, schema=schema)
