"""Porter stemmer, step 1 ONLY — the reference's exact quirk.

The reference (``/root/reference/src/edu/nyu/cs/cs2580/PorterStemming.java``)
ships the classic Porter (1980) stemmer but its ``stem()`` driver
(PorterStemming.java:550-562) calls ``step1()`` and comments out steps 2-6,
and skips stemming entirely unless ``k > 1`` (i.e. word length >= 3).
This module re-implements those semantics from the published algorithm
description — it is NOT a code port; the algorithm is public (Porter 1980,
"An algorithm for suffix stripping").

Semantics reproduced exactly (PorterStemming.java:259-289):
  step 1a: sses->ss | ies->i | trailing s dropped unless preceded by 's'
  step 1b: eed -> ee if m>0;
           else (ed|ing) removed if stem contains a vowel, then:
             at->ate | bl->ble | iz->ize
             | double consonant (not l,s,z) undoubled
             | m==1 and cvc -> append 'e'

Documented examples (PorterStemming.java:247-257): caresses->caress,
ponies->poni, ties->ti, caress->caress, cats->cat, feed->feed,
agreed->agree, disabled->disable, matting->mat, mating->mate,
meeting->meet, milling->mill, messing->mess, meetings->meet.

Words of length <= 2 are returned unchanged (the ``k > 1`` guard at
PorterStemming.java:551-552).
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _cons(b: str, i: int) -> bool:
    ch = b[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return True if i == 0 else not _cons(b, i - 1)
    return True


def _m(b: str, j: int) -> int:
    """Count consonant sequences in b[0..j] (inclusive)."""
    n = 0
    i = 0
    while True:
        if i > j:
            return n
        if not _cons(b, i):
            break
        i += 1
    i += 1
    while True:
        while True:
            if i > j:
                return n
            if _cons(b, i):
                break
            i += 1
        i += 1
        n += 1
        while True:
            if i > j:
                return n
            if not _cons(b, i):
                break
            i += 1
        i += 1


def _vowel_in_stem(b: str, j: int) -> bool:
    return any(not _cons(b, i) for i in range(j + 1))


def _doublec(b: str, j: int) -> bool:
    if j < 1:
        return False
    if b[j] != b[j - 1]:
        return False
    return _cons(b, j)


def _cvc(b: str, i: int) -> bool:
    if i < 2 or not _cons(b, i) or _cons(b, i - 1) or not _cons(b, i - 2):
        return False
    return b[i] not in "wxy"


def porter_step1(word: str) -> str:
    """Apply Porter step 1 to an (already lowercased) word.

    Mirrors the reference driver exactly: no-op for words shorter than 3
    characters; the word may contain arbitrary characters (digits,
    punctuation) — anything that is not a-e-i-o-u (or a 'y' after a vowel)
    counts as a consonant, as in the original char-switch.
    """
    k = len(word) - 1
    if k <= 1:
        return word

    b = list(word)

    def ends(s: str) -> int | None:
        """Return j = k - len(s) if b[..k] ends with s, else None."""
        l = len(s)
        o = k - l + 1
        if o < 0:
            return None
        for i in range(l):
            if b[o + i] != s[i]:
                return None
        return k - l

    def setto(j: int, s: str) -> int:
        """Write s at b[j+1..]; return new k."""
        for i, ch in enumerate(s):
            pos = j + 1 + i
            if pos < len(b):
                b[pos] = ch
            else:
                b.append(ch)
        return j + len(s)

    # step 1a
    if b[k] == "s":
        j = ends("sses")
        if j is not None:
            k -= 2
        else:
            j = ends("ies")
            if j is not None:
                k = setto(j, "i")
            elif b[k - 1] != "s":
                k -= 1

    # step 1b
    word_k = "".join(b[: k + 1])

    def ends_k(s: str) -> int | None:
        if word_k.endswith(s) and len(s) <= k + 1:
            return k - len(s)
        return None

    j = ends_k("eed")
    if j is not None:
        if _m(word_k, j) > 0:
            k -= 1
    else:
        j = ends_k("ed")
        if j is None:
            j = ends_k("ing")
        if j is not None and _vowel_in_stem(word_k, j):
            k = j
            stem = word_k[: k + 1]
            if stem.endswith("at"):
                k = setto(k - 2, "ate")
            elif stem.endswith("bl"):
                k = setto(k - 2, "ble")
            elif stem.endswith("iz"):
                k = setto(k - 2, "ize")
            elif _doublec(stem, k):
                k -= 1
                if b[k] in "lsz":
                    k += 1
            elif _m(stem, k) == 1 and _cvc(stem, k):
                k = setto(k, "e")

    return "".join(b[: k + 1])
