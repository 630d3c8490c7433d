"""Porter stemmer, NLTK_EXTENSIONS semantics, as a pure function.

The reference scores BM25 over tokens stemmed with
``nltk.stem.PorterStemmer()`` in its default NLTK_EXTENSIONS mode
(reference: src/lean_explore/local/search.py:630-638, dependency
pyproject.toml:37).  ``nltk`` is not installable in this environment, so
this module re-implements the algorithm from the published Porter 1980
paper plus NLTK's documented extensions (nltk/stem/porter.py, Apache-2.0,
itself derived from Martin Porter's public-domain implementation):

* an irregular-forms pool (sky/dying/lying/tying/news/innings/...),
* words of length <= 2 are returned unchanged,
* step 1a: ``ies -> ie`` when the word has length 4 (``dies -> die``
  but ``flies -> fli``),
* step 1b: ``ied -> ie`` (length 4) / ``ied -> i`` otherwise,
* step 1c: ``y -> i`` only after a consonant and only when the stem is
  longer than one character (``happy -> happi``, ``enjoy -> enjoy``,
  ``say -> say``),
* step 2: the ``alli -> al`` rule is tried first and recurses,
  ``fulli -> ful`` added, ``bli -> ble`` replaces ``abli -> able``,
  ``logi -> log`` measured against the stem including the ``l``,
* ``_ends_cvc`` treats a two-letter vowel-consonant word as CVC.

The function is deterministic, has no state, and is used both inside
Arrow pandas UDFs (executor side) and in the in-repo numpy BM25 oracle,
so engine and oracle tokenize identically by construction.
"""

from __future__ import annotations

from functools import lru_cache

_VOWELS = frozenset("aeiou")

_IRREGULAR_FORMS = {
    "sky": ["sky", "skies"],
    "die": ["dying"],
    "lie": ["lying"],
    "tie": ["tying"],
    "news": ["news"],
    "inning": ["innings", "inning"],
    "outing": ["outings", "outing"],
    "canning": ["cannings", "canning"],
    "howe": ["howe"],
    "proceed": ["proceed"],
    "exceed": ["exceed"],
    "succeed": ["succeed"],
}
_POOL = {form: stem for stem, forms in _IRREGULAR_FORMS.items() for form in forms}


def _is_consonant(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        if i == 0:
            return True
        return not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    # number of VC sequences in the c/v string of the stem
    cv = []
    for i in range(len(stem)):
        cv.append("c" if _is_consonant(stem, i) else "v")
    return "".join(cv).count("vc")


def _has_positive_measure(stem: str) -> bool:
    return _measure(stem) > 0


def _contains_vowel(stem: str) -> bool:
    for i in range(len(stem)):
        if not _is_consonant(stem, i):
            return True
    return False


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    return (
        len(word) >= 3
        and _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in ("w", "x", "y")
    ) or (
        # NLTK extension: a two-letter vowel-consonant word counts as CVC
        len(word) == 2
        and not _is_consonant(word, 0)
        and _is_consonant(word, 1)
    )


def _replace_suffix(word: str, suffix: str, replacement: str) -> str:
    if suffix == "":
        return word + replacement
    return word[: -len(suffix)] + replacement


def _apply_rule_list(word, rules):
    # First matching suffix wins; if its condition fails, stop (no
    # further rules are tried) — this mirrors NLTK exactly.
    for suffix, replacement, condition in rules:
        if suffix == "*d" and _ends_double_consonant(word):
            stem = word[:-2]
            if condition is None or condition(stem):
                return stem + replacement
            return word
        if word.endswith(suffix):
            stem = _replace_suffix(word, suffix, "")
            if condition is None or condition(stem):
                return stem + replacement
            return word
    return word


def _step1a(word: str) -> str:
    if word.endswith("ies") and len(word) == 4:
        return _replace_suffix(word, "ies", "ie")
    return _apply_rule_list(
        word,
        [
            ("sses", "ss", None),
            ("ies", "i", None),
            ("ss", "ss", None),
            ("s", "", None),
        ],
    )


def _step1b(word: str) -> str:
    if word.endswith("ied"):
        if len(word) == 4:
            return _replace_suffix(word, "ied", "ie")
        return _replace_suffix(word, "ied", "i")

    if word.endswith("eed"):
        stem = _replace_suffix(word, "eed", "")
        if _measure(stem) > 0:
            return stem + "ee"
        return word

    rule_2_or_3_succeeded = False
    intermediate_stem = word
    for suffix in ("ed", "ing"):
        if word.endswith(suffix):
            intermediate_stem = _replace_suffix(word, suffix, "")
            if _contains_vowel(intermediate_stem):
                rule_2_or_3_succeeded = True
                break
    if not rule_2_or_3_succeeded:
        return word

    return _apply_rule_list(
        intermediate_stem,
        [
            ("at", "ate", None),
            ("bl", "ble", None),
            ("iz", "ize", None),
            (
                "*d",
                intermediate_stem[-1],
                lambda stem: intermediate_stem[-1] not in ("l", "s", "z"),
            ),
            (
                "",
                "e",
                lambda stem: _measure(stem) == 1 and _ends_cvc(stem),
            ),
        ],
    )


def _step1c(word: str) -> str:
    def nltk_condition(stem: str) -> bool:
        # y -> i only when preceded by a consonant and the stem is
        # longer than a single character (happy -> happi, say -> say)
        return len(stem) > 1 and _is_consonant(stem, len(stem) - 1)

    return _apply_rule_list(word, [("y", "i", nltk_condition)])


def _step2(word: str) -> str:
    if word.endswith("alli") and _has_positive_measure(
        _replace_suffix(word, "alli", "")
    ):
        return _step2(_replace_suffix(word, "alli", "al"))

    rules = [
        ("ational", "ate", _has_positive_measure),
        ("tional", "tion", _has_positive_measure),
        ("enci", "ence", _has_positive_measure),
        ("anci", "ance", _has_positive_measure),
        ("izer", "ize", _has_positive_measure),
        ("bli", "ble", _has_positive_measure),
        ("alli", "al", _has_positive_measure),
        ("entli", "ent", _has_positive_measure),
        ("eli", "e", _has_positive_measure),
        ("ousli", "ous", _has_positive_measure),
        ("ization", "ize", _has_positive_measure),
        ("ation", "ate", _has_positive_measure),
        ("ator", "ate", _has_positive_measure),
        ("alism", "al", _has_positive_measure),
        ("iveness", "ive", _has_positive_measure),
        ("fulness", "ful", _has_positive_measure),
        ("ousness", "ous", _has_positive_measure),
        ("aliti", "al", _has_positive_measure),
        ("iviti", "ive", _has_positive_measure),
        ("biliti", "ble", _has_positive_measure),
        ("fulli", "ful", _has_positive_measure),
        # the 'l' of 'logi' stays with the stem for the measure test so
        # that short stems (geo, theo) behave like longer ones
        ("logi", "log", lambda stem: _has_positive_measure(word[:-3])),
    ]
    return _apply_rule_list(word, rules)


def _step3(word: str) -> str:
    return _apply_rule_list(
        word,
        [
            ("icate", "ic", _has_positive_measure),
            ("ative", "", _has_positive_measure),
            ("alize", "al", _has_positive_measure),
            ("iciti", "ic", _has_positive_measure),
            ("ical", "ic", _has_positive_measure),
            ("ful", "", _has_positive_measure),
            ("ness", "", _has_positive_measure),
        ],
    )


def _step4(word: str) -> str:
    def measure_gt_1(stem: str) -> bool:
        return _measure(stem) > 1

    return _apply_rule_list(
        word,
        [
            ("al", "", measure_gt_1),
            ("ance", "", measure_gt_1),
            ("ence", "", measure_gt_1),
            ("er", "", measure_gt_1),
            ("ic", "", measure_gt_1),
            ("able", "", measure_gt_1),
            ("ible", "", measure_gt_1),
            ("ant", "", measure_gt_1),
            ("ement", "", measure_gt_1),
            ("ment", "", measure_gt_1),
            ("ent", "", measure_gt_1),
            (
                "ion",
                "",
                lambda stem: _measure(stem) > 1 and stem[-1] in ("s", "t"),
            ),
            ("ou", "", measure_gt_1),
            ("ism", "", measure_gt_1),
            ("ate", "", measure_gt_1),
            ("iti", "", measure_gt_1),
            ("ous", "", measure_gt_1),
            ("ive", "", measure_gt_1),
            ("ize", "", measure_gt_1),
        ],
    )


def _step5a(word: str) -> str:
    if word.endswith("e"):
        stem = _replace_suffix(word, "e", "")
        if _measure(stem) > 1:
            return stem
        if _measure(stem) == 1 and not _ends_cvc(stem):
            return stem
    return word


def _step5b(word: str) -> str:
    return _apply_rule_list(
        word, [("ll", "l", lambda stem: _measure(word[:-1]) > 1)]
    )


@lru_cache(maxsize=1 << 16)
def porter_stem(word: str) -> str:
    """Stem a single (already lowercased) token.

    The lru_cache makes repeated stemming of a Zipf-distributed token
    stream ~free: the executor-side pandas UDF hits the cache for all
    hot terms. Cache key space is bounded by the corpus vocabulary.
    """
    if word in _POOL:
        return _POOL[word]
    if len(word) <= 2:
        return word

    stem = _step1a(word)
    stem = _step1b(stem)
    stem = _step1c(stem)
    stem = _step2(stem)
    stem = _step3(stem)
    stem = _step4(stem)
    stem = _step5a(stem)
    stem = _step5b(stem)
    return stem
