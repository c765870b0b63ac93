"""Double Metaphone phonetic encoder (Lawrence Philips, 2000 — the
published algorithm behind Apache commons-codec's DoubleMetaphone, which
the reference's DoubleMetaphoneFilter wraps:
analysis/phonetic/src/java/.../DoubleMetaphoneFilter.java:31).

Produces a (primary, alternate) code pair; the alternate differs only for
words with ambiguous pronunciations (Slavic/Germanic names, etc.).
Validated against the reference filter's golden outputs
(DoubleMetaphoneFilterTest.java: international->ANTR/ANTRNXNL,
Kuczewski->KSSK+KXFS) in tests/test_metaphone.py.
"""

from __future__ import annotations

_VOWELS = frozenset("AEIOUY")


def double_metaphone(value: str, max_len: int = 4):
    """-> (primary, alternate_or_None). Empty primary for unencodable
    input (no letters)."""
    w = value.upper()
    n = len(w)
    pri: list[str] = []
    sec: list[str] = []

    def c(i: int) -> str:
        return w[i] if 0 <= i < n else ""

    def sat(start: int, ln: int, *opts: str) -> bool:
        if start < 0 or start + ln > n + 99:
            return False
        return w[start:start + ln] in opts if start >= 0 else False

    def vowel(i: int) -> bool:
        return 0 <= i < n and w[i] in _VOWELS

    plen = slen = 0

    def add(p: str, s: str | None = None) -> None:
        nonlocal plen, slen
        pri.append(p)
        sec.append(p if s is None else s)
        plen += len(p)
        slen += len(p if s is None else s)

    slavo = ("W" in w) or ("K" in w) or ("CZ" in w) or ("WITZ" in w)
    last = n - 1
    i = 0

    # silent initial letters
    if sat(0, 2, "GN", "KN", "PN", "WR", "PS"):
        i = 1
    if c(0) == "X":                 # initial X -> S (Xavier)
        add("S")
        i = 1

    while i < n and (plen < max_len or slen < max_len):
        ch = c(i)
        if ch in _VOWELS:
            if i == 0:
                add("A")
            i += 1
            continue
        if ch == "B":               # -mb silent handled by dedupe of B
            add("P")
            i += 2 if c(i + 1) == "B" else 1
            continue
        if ch == "Ç":
            add("S")
            i += 1
            continue
        if ch == "C":
            # germanic -ACH-
            if (i > 1 and not vowel(i - 2) and sat(i - 1, 3, "ACH")
                    and c(i + 2) != "I"
                    and (c(i + 2) != "E"
                         or sat(i - 2, 6, "BACHER", "MACHER"))):
                add("K")
                i += 2
                continue
            if i == 0 and sat(i, 6, "CAESAR"):
                add("S")
                i += 2
                continue
            if sat(i, 4, "CHIA"):   # italian chianti
                add("K")
                i += 2
                continue
            if sat(i, 2, "CH"):
                if i > 0 and sat(i, 4, "CHAE"):     # michael
                    add("K", "X")
                    i += 2
                    continue
                if (i == 0
                        and (sat(i + 1, 5, "HARAC", "HARIS")
                             or sat(i + 1, 3, "HOR", "HYM", "HIA", "HEM"))
                        and not sat(0, 5, "CHORE")):
                    add("K")        # greek roots: chorus etc.
                    i += 2
                    continue
                # germanic/greek: ch -> K
                if ((sat(0, 4, "VAN ", "VON ") or sat(0, 3, "SCH"))
                        or sat(i - 2, 6, "ORCHES", "ARCHIT", "ORCHID")
                        or sat(i + 2, 1, "T", "S")
                        or ((sat(i - 1, 1, "A", "O", "U", "E") or i == 0)
                            and sat(i + 2, 1, "L", "R", "N", "M", "B", "H",
                                    "F", "V", "W", " "))):
                    add("K")
                else:
                    if i > 0:
                        if sat(0, 2, "MC"):
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                i += 2
                continue
            if sat(i, 2, "CZ") and not sat(i - 2, 4, "WICZ"):
                add("S", "X")
                i += 2
                continue
            if sat(i + 1, 3, "CIA"):    # focaccia
                add("X")
                i += 3
                continue
            if sat(i, 2, "CC") and not (i == 1 and c(0) == "M"):
                # double C, but not McClellan
                if sat(i + 2, 1, "I", "E", "H") and not sat(i + 2, 2, "HU"):
                    if ((i == 1 and c(i - 1) == "A")
                            or sat(i - 1, 5, "UCCEE", "UCCES")):
                        add("KS")   # accident, succeed
                    else:
                        add("X")    # bacci
                    i += 3
                    continue
                add("K")
                i += 2
                continue
            if sat(i, 2, "CK", "CG", "CQ"):
                add("K")
                i += 2
                continue
            if sat(i, 2, "CI", "CE", "CY"):
                if sat(i, 3, "CIO", "CIE", "CIA"):
                    add("S", "X")   # italian vs others
                else:
                    add("S")
                i += 2
                continue
            add("K")
            if sat(i + 1, 2, " C", " Q", " G"):     # mac caffrey
                i += 3
            elif (sat(i + 1, 1, "C", "K", "Q")
                    and not sat(i + 1, 2, "CE", "CI")):
                i += 2
            else:
                i += 1
            continue
        if ch == "D":
            if sat(i, 2, "DG"):
                if sat(i + 2, 1, "I", "E", "Y"):
                    add("J")        # edge
                    i += 3
                    continue
                add("TK")           # edgar
                i += 2
                continue
            if sat(i, 2, "DT", "DD"):
                add("T")
                i += 2
                continue
            add("T")
            i += 1
            continue
        if ch == "F":
            add("F")
            i += 2 if c(i + 1) == "F" else 1
            continue
        if ch == "G":
            if c(i + 1) == "H":
                if i > 0 and not vowel(i - 1):
                    add("K")
                    i += 2
                    continue
                if i == 0:
                    if c(i + 2) == "I":
                        add("J")    # ghislane
                    else:
                        add("K")    # ghoul
                    i += 2
                    continue
                # silent gh (though, cough handled as F below)
                if ((i > 1 and sat(i - 2, 1, "B", "H", "D"))
                        or (i > 2 and sat(i - 3, 1, "B", "H", "D"))
                        or (i > 3 and sat(i - 4, 1, "B", "H"))):
                    i += 2
                    continue
                if (i > 2 and c(i - 1) == "U"
                        and sat(i - 3, 1, "C", "G", "L", "R", "T")):
                    add("F")        # laugh, cough
                elif i > 0 and c(i - 1) != "I":
                    add("K")
                i += 2
                continue
            if c(i + 1) == "N":
                if i == 1 and vowel(0) and not slavo:
                    add("KN", "N")
                elif (not sat(i + 2, 2, "EY") and c(i + 1) != "Y"
                        and not slavo):
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
                continue
            if sat(i + 1, 2, "LI") and not slavo:   # tagliaro
                add("KL", "L")
                i += 2
                continue
            # ges-, gep- etc. initial
            if (i == 0 and (c(i + 1) == "Y"
                            or sat(i + 1, 2, "ES", "EP", "EB", "EL", "EY",
                                   "IB", "IL", "IN", "IE", "EI", "ER"))):
                add("K", "J")
                i += 2
                continue
            if ((sat(i + 1, 2, "ER") or c(i + 1) == "Y")
                    and not sat(0, 6, "DANGER", "RANGER", "MANGER")
                    and not sat(i - 1, 1, "E", "I")
                    and not sat(i - 1, 3, "RGY", "OGY")):
                add("K", "J")       # -ger-, -gy-
                i += 2
                continue
            if (sat(i + 1, 1, "E", "I", "Y")
                    or sat(i - 1, 4, "AGGI", "OGGI")):
                if (sat(0, 4, "VAN ", "VON ") or sat(0, 3, "SCH")
                        or sat(i + 1, 2, "ET")):
                    add("K")        # germanic
                elif sat(i + 1, 4, "IER "):
                    add("J")
                else:
                    add("J", "K")
                i += 2
                continue
            add("K")
            i += 2 if c(i + 1) == "G" else 1
            continue
        if ch == "H":
            if (i == 0 or vowel(i - 1)) and vowel(i + 1):
                add("H")            # only between vowels or start
                i += 2
            else:
                i += 1
            continue
        if ch == "J":
            if sat(i, 4, "JOSE") or sat(0, 4, "SAN "):
                if ((i == 0 and (c(i + 4) == " " or n == 4))
                        or sat(0, 4, "SAN ")):
                    add("H")        # san jose / san jacinto
                else:
                    add("J", "H")
                i += 1
                continue
            if i == 0 and not sat(i, 4, "JOSE"):
                add("J", "A")       # Yankelovich/Jankelowicz
            elif (vowel(i - 1) and not slavo
                    and (c(i + 1) == "A" or c(i + 1) == "O")):
                add("J", "H")
            elif i == last:
                add("J", "")
            elif (not sat(i + 1, 1, "L", "T", "K", "S", "N", "M", "B", "Z")
                    and not sat(i - 1, 1, "S", "K", "L")):
                add("J")
            i += 2 if c(i + 1) == "J" else 1
            continue
        if ch == "K":
            add("K")
            i += 2 if c(i + 1) == "K" else 1
            continue
        if ch == "L":
            if c(i + 1) == "L":
                # spanish -illo/-illa
                if ((i == n - 3
                        and sat(i - 1, 4, "ILLO", "ILLA", "ALLE"))
                        or ((sat(last - 1, 2, "AS", "OS")
                             or sat(last, 1, "A", "O"))
                            and sat(i - 1, 4, "ALLE"))):
                    add("L", "")
                    i += 2
                    continue
                i += 2
            else:
                i += 1
            add("L")
            continue
        if ch == "M":
            add("M")
            if ((sat(i - 1, 3, "UMB")
                    and (i + 1 == last or sat(i + 2, 2, "ER")))
                    or c(i + 1) == "M"):
                i += 2
            else:
                i += 1
            continue
        if ch == "N":
            add("N")
            i += 2 if c(i + 1) == "N" else 1
            continue
        if ch == "Ñ":
            add("N")
            i += 1
            continue
        if ch == "P":
            if c(i + 1) == "H":
                add("F")
                i += 2
                continue
            add("P")
            i += 2 if sat(i + 1, 1, "P", "B") else 1
            continue
        if ch == "Q":
            add("K")
            i += 2 if c(i + 1) == "Q" else 1
            continue
        if ch == "R":
            # french -er final
            if (i == last and not slavo and sat(i - 2, 2, "IE")
                    and not sat(i - 4, 2, "ME", "MA")):
                add("", "R")
            else:
                add("R")
            i += 2 if c(i + 1) == "R" else 1
            continue
        if ch == "S":
            if sat(i - 1, 3, "ISL", "YSL"):     # island, carlisle
                i += 1
                continue
            if i == 0 and sat(i, 5, "SUGAR"):
                add("X", "S")
                i += 1
                continue
            if sat(i, 2, "SH"):
                if sat(i + 1, 4, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")        # germanic
                else:
                    add("X")
                i += 2
                continue
            if sat(i, 3, "SIO", "SIA") or sat(i, 4, "SIAN"):
                if slavo:
                    add("S")
                else:
                    add("S", "X")
                i += 3
                continue
            if ((i == 0 and sat(i + 1, 1, "M", "N", "L", "W"))
                    or sat(i + 1, 1, "Z")):
                add("S", "X")       # germanic
                i += 2 if sat(i + 1, 1, "Z") else 1
                continue
            if sat(i, 2, "SC"):
                if c(i + 2) == "H":
                    if sat(i + 3, 2, "OO", "ER", "EN", "UY", "ED", "EM"):
                        if sat(i + 3, 2, "ER", "EN"):
                            add("X", "SK")      # schermerhorn
                        else:
                            add("SK")           # school
                        i += 3
                        continue
                    if i == 0 and not vowel(3) and c(3) != "W":
                        add("X", "S")
                    else:
                        add("X")
                    i += 3
                    continue
                if sat(i + 2, 1, "I", "E", "Y"):
                    add("S")
                    i += 3
                    continue
                add("SK")
                i += 3
                continue
            if i == last and sat(i - 2, 2, "AI", "OI"):
                add("", "S")        # french resnais, artois
            else:
                add("S")
            i += 2 if sat(i + 1, 1, "S", "Z") else 1
            continue
        if ch == "T":
            if sat(i, 4, "TION") or sat(i, 3, "TIA", "TCH"):
                add("X")
                i += 3
                continue
            if sat(i, 2, "TH") or sat(i, 3, "TTH"):
                if (sat(i + 2, 2, "OM", "AM")
                        or sat(0, 4, "VAN ", "VON ") or sat(0, 3, "SCH")):
                    add("T")        # thomas, thames
                else:
                    add("0", "T")   # '0' = th sound
                i += 2
                continue
            add("T")
            i += 2 if sat(i + 1, 1, "T", "D") else 1
            continue
        if ch == "V":
            add("F")
            i += 2 if c(i + 1) == "V" else 1
            continue
        if ch == "W":
            if sat(i, 2, "WR"):
                add("R")
                i += 2
                continue
            if i == 0 and (vowel(i + 1) or sat(i, 2, "WH")):
                if vowel(i + 1):
                    add("A", "F")   # wasserman
                else:
                    add("A")        # wharton
            if ((i == last and vowel(i - 1))
                    or sat(i - 1, 5, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
                    or sat(0, 3, "SCH")):
                add("", "F")        # polish e.g. filipowicz
                i += 1
                continue
            if sat(i, 4, "WICZ", "WITZ"):
                add("TS", "FX")
                i += 4
                continue
            i += 1
            continue
        if ch == "X":
            if not (i == last
                    and (sat(i - 3, 3, "IAU", "EAU")
                         or sat(i - 2, 2, "AU", "OU"))):
                add("KS")           # not french breaux
            i += 2 if sat(i + 1, 1, "C", "X") else 1
            continue
        if ch == "Z":
            if c(i + 1) == "H":
                add("J")            # chinese pinyin zh
                i += 2
                continue
            if (sat(i + 1, 2, "ZO", "ZI", "ZA")
                    or (slavo and i > 0 and c(i - 1) != "T")):
                add("S", "TS")
            else:
                add("S")
            i += 2 if c(i + 1) == "Z" else 1
            continue
        i += 1

    p = "".join(pri)[:max_len]
    s = "".join(sec)[:max_len]
    if not p and not s:
        return ("", None)
    return (p, s if s != p else None)
