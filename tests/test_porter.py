"""Porter step-1 unit tests against the reference's documented examples
(PorterStemming.java:247-257) and the k>1 guard (:550-562)."""

from hypothesis import given, strategies as st

from websearchengine_spark.functions.porter import porter_step1


DOCUMENTED = {
    # PorterStemming.java:247-257 (step1 javadoc examples)
    "caresses": "caress",
    "ponies": "poni",
    "ties": "ti",
    "caress": "caress",
    "cats": "cat",
    "feed": "feed",
    "agreed": "agree",
    "disabled": "disable",
    "matting": "mat",
    "mating": "mate",
    "meeting": "meet",
    "milling": "mill",
    "messing": "mess",
    "meetings": "meet",
}


def test_documented_examples():
    for w, expect in DOCUMENTED.items():
        assert porter_step1(w) == expect, w


def test_short_words_unchanged():
    # k > 1 guard: words of length <= 2 are returned as-is
    for w in ["a", "i", "as", "is", "ab", "s", ""]:
        assert porter_step1(w) == w


def test_step1_only_no_later_steps():
    # step 2 would turn 'happy' -> 'happi'; step-1-only leaves it alone
    assert porter_step1("happy") == "happy"
    # step 3 would map 'relational' -> 'relate'; untouched here
    assert porter_step1("relational") == "relational"


def test_step1a_edge_cases():
    assert porter_step1("sses") == "ss"
    assert porter_step1("ies") == "i"
    # trailing s after another s is kept
    assert porter_step1("grass") == "grass"
    assert porter_step1("its") == "it"


def test_step1b_edge_cases():
    # eed with m() == 0 stays
    assert porter_step1("eed") == "eed"
    # 'freed': stem before 'eed' is 'fr' -> m()==0 -> eed kept (reference
    # guard at PorterStemming.java:268-270)
    assert porter_step1("freed") == "freed"
    assert porter_step1("agreed") == "agree"
    # ed removal + at->ate
    assert porter_step1("conflated") == "conflate"
    # ing removal + bl->ble
    assert porter_step1("troubling") == "trouble"
    # iz->ize
    assert porter_step1("sized") == "size"
    # double consonant undoubled (hopping -> hop) but not for l/s/z
    assert porter_step1("hopping") == "hop"
    assert porter_step1("falling") == "fall"
    assert porter_step1("hissing") == "hiss"
    assert porter_step1("fizzed") == "fizz"
    # m()==1 cvc -> +e (filing -> file)
    assert porter_step1("filing") == "file"
    # no vowel in stem -> ed/ing kept
    assert porter_step1("bled") == "bled"
    assert porter_step1("sing") == "sing"


def test_non_alpha_tokens_pass_through_consonant_logic():
    # digits/punct are consonants in the original char switch; must not crash
    assert porter_step1("123") == "123"
    assert porter_step1("a1b2") == "a1b2"
    porter_step1("don't")
    porter_step1("x-ray")


@given(st.text(alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=30))
def test_never_crashes_and_never_grows_much(w):
    out = porter_step1(w)
    assert isinstance(out, str)
    # step 1 can grow a word by at most 1 char (cvc -> +e / at -> ate)
    assert len(out) <= len(w) + 1
