"""F14 byte-offset → line/col mapper: differential vs the reference's
SourceFilePositionMapper (dev_tools/population/phase2_tasks.py:216-381)
plus the Spark map_spans operator."""

from __future__ import annotations

import sys

import pytest

from lean_explore_spark.functions.positions import PositionMapper

TEXTS = [
    "",
    "\n",
    "hello",
    "hello\n",
    "a\nbb\nccc\n",
    "line one\nline two\nline three",
    # multi-byte UTF-8: 2-, 3-, 4-byte chars, incl. right before \n
    "héllo wörld\nnaïve\n",
    "αβγ\nδε\n𝕊𝕋\nend",
    "日本語のテキスト\n第二行\n",
    "mixed ascii é𝄞中\nsecond 𝄞 line",
    "\n\n\n",
    "no newline at all é",
]


def _ref_mapper_cls():
    """Import the reference class with its heavy deps stubbed (same
    pattern as tests/test_lean_text.py)."""
    import types
    from unittest.mock import MagicMock

    for name in [
        "sqlalchemy",
        "sqlalchemy.orm",
        "tqdm",
        "lean_explore",
        "lean_explore.shared",
        "lean_explore.shared.models",
        "lean_explore.shared.models.db",
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__getattr__ = lambda _n, _m=MagicMock(): _m  # type: ignore
            sys.modules[name] = mod
    sys.modules["sqlalchemy"].select = MagicMock()
    sys.modules["sqlalchemy.orm"].Session = MagicMock()
    sys.modules["sqlalchemy.orm"].sessionmaker = MagicMock()
    sys.modules["tqdm"].tqdm = lambda x, **k: x
    sys.modules["lean_explore.shared.models.db"].Declaration = MagicMock()
    sys.path.insert(0, "/root/reference/dev_tools")
    try:
        from population.phase2_tasks import SourceFilePositionMapper

        return SourceFilePositionMapper
    except Exception:
        return None


REF_CLS = _ref_mapper_cls()


@pytest.mark.skipif(REF_CLS is None, reason="reference not importable")
@pytest.mark.parametrize("text", TEXTS)
def test_differential_vs_reference(text):
    ours = PositionMapper(text)
    ref = REF_CLS(text)
    nb = ours.total_bytes
    assert nb == ref.total_bytes and ours.total_chars == ref.total_chars
    spans = [(s, e) for s in range(0, nb + 2) for e in range(s, nb + 2)]
    spans += [(None, 3), (2, None), (-1, 4), (5, 2)]
    for s, e in spans:
        got = ours.convert_byte_span_to_details(s, e)
        want = ref.convert_byte_span_to_details(s, e)
        assert got == want, (text, s, e, got, want)


def test_mid_character_byte_floors_to_containing_char():
    # 'é' is 2 bytes at byte 0..1; offset 1 is mid-char → char 0, col 0
    m = PositionMapper("éx")
    assert m.position(1) == (1, 0, 0)
    assert m.position(2) == (1, 1, 1)


def test_invalid_spans_are_none():
    m = PositionMapper("abc")
    assert m.convert_byte_span_to_details(None, 1) == (None,) * 6
    assert m.convert_byte_span_to_details(2, 1) == (None,) * 6
    assert m.convert_byte_span_to_details(-1, 1) == (None,) * 6


def test_map_spans_spark_operator(spark):
    from lean_explore_spark.functions.positions import map_spans

    rows = []
    for did, text in enumerate(TEXTS):
        nb = len(text.encode("utf-8"))
        rows.append((did * 1000, text, 0, nb))
        rows.append((did * 1000 + 1, text, min(2, nb), nb))
        rows.append((did * 1000 + 2, text, None, nb))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, byte_start long, byte_end long"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in map_spans(df).repartition(4).collect()
    }
    assert len(got) == len(rows)
    for did, text, s, e in rows:
        want = PositionMapper(text).convert_byte_span_to_details(s, e)
        r = got[did]
        assert (
            r["start_line"],
            r["start_col"],
            r["end_line"],
            r["end_col"],
            r["start_char_idx"],
            r["end_char_idx"],
        ) == want


@pytest.mark.skipif(REF_CLS is None, reason="reference not importable")
def test_differential_hypothesis_random_unicode():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",),  # no lone surrogates
                max_codepoint=0x2FFFF,
            ),
            max_size=40,
        )
    )
    def check(text):
        ours = PositionMapper(text)
        ref = REF_CLS(text)
        nb = ours.total_bytes
        for s in range(0, nb + 2):
            for e in (s, s + 1, nb, nb + 1):
                if e < s:
                    continue
                assert ours.convert_byte_span_to_details(
                    s, e
                ) == ref.convert_byte_span_to_details(s, e), (text, s, e)

    check()
