"""Porter stemmer (NLTK_EXTENSIONS) test vectors.

Vectors chosen to pin every NLTK-specific deviation from the published
Porter 1980 algorithm (SURVEY.md §7 risk register), since the engine's
rank-identity to the reference hinges on analyzer parity
(reference: src/lean_explore/local/search.py:630-638).
"""

from lean_explore_spark.functions.porter import porter_stem


def test_irregular_pool():
    assert porter_stem("sky") == "sky"
    assert porter_stem("skies") == "sky"
    assert porter_stem("dying") == "die"
    assert porter_stem("lying") == "lie"
    assert porter_stem("tying") == "tie"
    assert porter_stem("news") == "news"
    assert porter_stem("innings") == "inning"
    assert porter_stem("proceed") == "proceed"
    assert porter_stem("exceed") == "exceed"
    assert porter_stem("succeed") == "succeed"


def test_short_words_untouched():
    assert porter_stem("a") == "a"
    assert porter_stem("is") == "is"
    assert porter_stem("by") == "by"
    assert porter_stem("as") == "as"  # length 2: no s-removal


def test_step1a():
    assert porter_stem("caresses") == "caress"
    assert porter_stem("ponies") == "poni"
    assert porter_stem("ties") == "tie"  # NLTK: length-4 ies -> ie
    assert porter_stem("dies") == "die"
    assert porter_stem("flies") == "fli"
    assert porter_stem("caress") == "caress"
    assert porter_stem("cats") == "cat"


def test_step1b():
    assert porter_stem("feed") == "feed"
    assert porter_stem("agreed") == "agre"  # eed->ee then step5a e-drop
    assert porter_stem("plastered") == "plaster"
    assert porter_stem("bled") == "bled"
    assert porter_stem("motoring") == "motor"
    assert porter_stem("sing") == "sing"
    assert porter_stem("conflated") == "conflat"  # at->ate, step5a drops e
    assert porter_stem("troubled") == "troubl"
    assert porter_stem("sized") == "size"
    assert porter_stem("hopping") == "hop"  # double consonant -> single
    assert porter_stem("tanned") == "tan"
    assert porter_stem("falling") == "fall"  # *d blocked for l
    assert porter_stem("hissing") == "hiss"  # *d blocked for s
    assert porter_stem("fizzed") == "fizz"  # *d blocked for z
    assert porter_stem("failing") == "fail"
    assert porter_stem("filing") == "file"  # m=1 & cvc -> +e
    assert porter_stem("died") == "die"  # NLTK: length-4 ied -> ie
    assert porter_stem("spied") == "spi"  # longer ied -> i


def test_step1c_nltk_y_rule():
    assert porter_stem("happy") == "happi"
    assert porter_stem("enjoy") == "enjoy"  # y after vowel unchanged
    assert porter_stem("say") == "say"
    assert porter_stem("cry") == "cri"
    assert porter_stem("sympathy") == "sympathi"


def test_step2():
    assert porter_stem("relational") == "relat"
    assert porter_stem("conditional") == "condit"
    assert porter_stem("rational") == "ration"
    assert porter_stem("valenci") == "valenc"  # enci->ence, e dropped 5a
    assert porter_stem("digitizer") == "digit"
    assert porter_stem("operator") == "oper"
    assert porter_stem("feudalism") == "feudal"
    assert porter_stem("decisiveness") == "decis"
    assert porter_stem("hopefulness") == "hope"
    assert porter_stem("callousness") == "callous"
    assert porter_stem("formality") == "formal"
    assert porter_stem("sensitivity") == "sensit"
    assert porter_stem("sensibility") == "sensibl"
    assert porter_stem("radically") == "radic"  # alli-first + recursion
    assert porter_stem("homologies") == "homolog"  # logi keeps its l


def test_step3_through_5():
    assert porter_stem("triplicate") == "triplic"
    assert porter_stem("formative") == "form"
    assert porter_stem("formalize") == "formal"
    assert porter_stem("electricity") == "electr"
    assert porter_stem("electrical") == "electr"
    assert porter_stem("hopeful") == "hope"
    assert porter_stem("goodness") == "good"
    assert porter_stem("revival") == "reviv"
    assert porter_stem("allowance") == "allow"
    assert porter_stem("inference") == "infer"
    assert porter_stem("airliner") == "airlin"
    assert porter_stem("adjustable") == "adjust"
    assert porter_stem("defensible") == "defens"
    assert porter_stem("replacement") == "replac"
    assert porter_stem("adoption") == "adopt"
    assert porter_stem("communism") == "commun"
    assert porter_stem("activate") == "activ"
    assert porter_stem("angularity") == "angular"
    assert porter_stem("probate") == "probat"
    assert porter_stem("controll") == "control"
    assert porter_stem("roll") == "roll"


def test_math_vocabulary():
    # terms from the reference query set (benchmarking/queries.txt)
    assert porter_stem("numbers") == "number"
    assert porter_stem("definition") == "definit"
    assert porter_stem("theorem") == "theorem"
    assert porter_stem("theorems") == "theorem"
    assert porter_stem("commutativity") == "commut"
    assert porter_stem("topological") == "topolog"
    assert porter_stem("spaces") == "space"
    assert porter_stem("continuous") == "continu"
    assert porter_stem("functions") == "function"
    assert porter_stem("measurable") == "measur"
    assert porter_stem("convergence") == "converg"
    assert porter_stem("integration") == "integr"
    assert porter_stem("properties") == "properti"
