"""Double Metaphone phonetic encoder (Lawrence Philips' 2000 algorithm),
implemented from the published algorithm description.

Replaces fuzzystrmatch's ``str.dmetaphone`` / ``str.dmetaphone_alt`` used by
the reference's text prediction (sql/geocoder/002-text_prediction.sql:14-19)
and its wordlist indexes (001-wordlist_for_text_prediction.sql:90-91).
Postgres' dmetaphone (derived from Aubrey's Text::DoubleMetaphone) does not
truncate codes, so neither do we by default.

Returns (primary, alternate); alternate == primary when no alternate branch
fired (fuzzystrmatch's dmetaphone_alt likewise returns the primary in that
case).
"""

from __future__ import annotations

VOWELS = frozenset("AEIOUY")


def _is_vowel(s: str, i: int) -> bool:
    return 0 <= i < len(s) and s[i] in VOWELS


def _slavo_germanic(s: str) -> bool:
    return "W" in s or "K" in s or "CZ" in s or "WITZ" in s


def double_metaphone(value: str, max_length: int = 0) -> tuple[str, str]:
    """Encode ``value``; ``max_length`` 0 means unlimited (Postgres parity)."""
    if value is None:
        return ("", "")
    s = "".join(ch for ch in value.upper() if "A" <= ch <= "Z" or ch == " ")
    length = len(s)
    if length == 0:
        return ("", "")
    pad = s + "     "
    first = s[:1]
    pri: list[str] = []
    alt: list[str] = []

    def add(p: str, a: str | None = None) -> None:
        pri.append(p)
        alt.append(p if a is None else a)

    i = 0
    # skip silent initial letters
    if s[:2] in ("GN", "KN", "PN", "WR", "PS"):
        i = 1
    if first == "X":  # initial X pronounced Z -> S
        add("S")
        i = 1

    while i < length:
        if max_length and len("".join(pri)) >= max_length and len("".join(alt)) >= max_length:
            break
        c = s[i]
        nxt = pad[i + 1]

        if c in VOWELS:
            if i == 0:
                add("A")
            i += 1
            continue

        if c == "B":
            add("P")
            i += 2 if nxt == "B" else 1
            continue

        if c == "\xc7":
            add("S")
            i += 1
            continue

        if c == "C":
            # germanic 'ach' as in 'bacher'
            if i > 1 and not _is_vowel(s, i - 2) and pad[i - 1 : i + 2] == "ACH" and (
                pad[i + 2] != "I" and (pad[i + 2] != "E" or pad[i - 2 : i + 4] in ("BACHER", "MACHER"))
            ):
                add("K")
                i += 2
                continue
            if i == 0 and pad[i : i + 6] == "CAESAR":
                add("S")
                i += 2
                continue
            if pad[i : i + 4] == "CHIA":
                add("K")
                i += 2
                continue
            if pad[i : i + 2] == "CH":
                if i > 0 and pad[i : i + 4] == "CHAE":
                    add("K", "X")
                    i += 2
                    continue
                if i == 0 and (
                    pad[i + 1 : i + 6] in ("HARAC", "HARIS")
                    or pad[i + 1 : i + 4] in ("HOR", "HYM", "HIA", "HEM")
                ) and pad[0:5] != "CHORE":
                    add("K")
                    i += 2
                    continue
                if (
                    pad[0:4] in ("VAN ", "VON ")
                    or pad[0:3] == "SCH"
                    or pad[i - 2 : i + 4] in ("ORCHES", "ARCHIT", "ORCHID")
                    or pad[i + 2] in ("T", "S")
                    or (
                        (i == 0 or pad[i - 1] in "AOUE")
                        and pad[i + 2] in "LRNMBHFVW "
                    )
                ):
                    add("K")
                else:
                    if i > 0:
                        if pad[0:2] == "MC":
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                i += 2
                continue
            if pad[i : i + 2] == "CZ" and pad[i - 2 : i + 2] != "WICZ":
                add("S", "X")
                i += 2
                continue
            if pad[i + 1 : i + 4] == "CIA":
                add("X")
                i += 3
                continue
            if pad[i : i + 2] == "CC" and not (i == 1 and first == "M"):
                if pad[i + 2] in ("I", "E", "H") and pad[i + 2 : i + 4] != "HU":
                    if (i == 1 and pad[i - 1] == "A") or pad[i - 1 : i + 4] in ("UCCEE", "UCCES"):
                        add("KS")
                    else:
                        add("X")
                    i += 3
                    continue
                add("K")
                i += 2
                continue
            if pad[i : i + 2] in ("CK", "CG", "CQ"):
                add("K")
                i += 2
                continue
            if pad[i : i + 2] in ("CI", "CE", "CY"):
                if pad[i : i + 3] in ("CIO", "CIE", "CIA"):
                    add("S", "X")
                else:
                    add("S")
                i += 2
                continue
            add("K")
            if pad[i + 1 : i + 3] in (" C", " Q", " G"):
                i += 3
            elif pad[i + 1] in ("C", "K", "Q") and pad[i + 1 : i + 3] not in ("CE", "CI"):
                i += 2
            else:
                i += 1
            continue

        if c == "D":
            if pad[i : i + 2] == "DG":
                if pad[i + 2] in ("I", "E", "Y"):
                    add("J")
                    i += 3
                else:
                    add("TK")
                    i += 2
                continue
            add("T")
            i += 2 if pad[i : i + 2] in ("DT", "DD") else 1
            continue

        if c == "F":
            add("F")
            i += 2 if nxt == "F" else 1
            continue

        if c == "G":
            if nxt == "H":
                if i > 0 and not _is_vowel(s, i - 1):
                    add("K")
                    i += 2
                    continue
                if i == 0:
                    if pad[i + 2] == "I":
                        add("J")
                    else:
                        add("K")
                    i += 2
                    continue
                if (
                    (i > 1 and pad[i - 2] in ("B", "H", "D"))
                    or (i > 2 and pad[i - 3] in ("B", "H", "D"))
                    or (i > 3 and pad[i - 4] in ("B", "H"))
                ):
                    i += 2
                    continue
                if i > 2 and pad[i - 1] == "U" and pad[i - 3] in ("C", "G", "L", "R", "T"):
                    add("F")
                elif i > 0 and pad[i - 1] != "I":
                    add("K")
                i += 2
                continue
            if nxt == "N":
                if i == 1 and _is_vowel(s, 0) and not _slavo_germanic(s):
                    add("KN", "N")
                elif pad[i + 2 : i + 4] != "EY" and pad[i + 1] != "Y" and not _slavo_germanic(s):
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
                continue
            if pad[i + 1 : i + 3] == "LI" and not _slavo_germanic(s):
                add("KL", "L")
                i += 2
                continue
            if i == 0 and (nxt == "Y" or pad[i + 1 : i + 3] in (
                "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")):
                add("K", "J")
                i += 2
                continue
            if (pad[i + 1 : i + 3] == "ER" or nxt == "Y") and pad[0:6] not in (
                "DANGER", "RANGER", "MANGER") and pad[i - 1] not in ("E", "I") and pad[
                i - 1 : i + 2] not in ("RGY", "OGY"):
                add("K", "J")
                i += 2
                continue
            if nxt in ("E", "I", "Y") or pad[i - 1 : i + 3] in ("AGGI", "OGGI"):
                if pad[0:4] in ("VAN ", "VON ") or pad[0:3] == "SCH" or pad[i + 1 : i + 3] == "ET":
                    add("K")
                elif pad[i + 1 : i + 5] == "IER ":
                    add("J")
                else:
                    add("J", "K")
                i += 2
                continue
            add("K")
            i += 2 if nxt == "G" else 1
            continue

        if c == "H":
            if (i == 0 or _is_vowel(s, i - 1)) and _is_vowel(s, i + 1):
                add("H")
                i += 2
            else:
                i += 1
            continue

        if c == "J":
            if pad[i : i + 4] == "JOSE" or pad[0:4] == "SAN ":
                if (i == 0 and pad[i + 4] == " ") or pad[0:4] == "SAN ":
                    add("H")
                else:
                    add("J", "H")
                i += 1
                continue
            if i == 0 and pad[i : i + 4] != "JOSE":
                add("J", "A")
            elif _is_vowel(s, i - 1) and not _slavo_germanic(s) and nxt in ("A", "O"):
                add("J", "H")
            elif i == length - 1:
                add("J", "")
            elif nxt not in "LTKSNMBZ" and pad[i - 1] not in ("S", "K", "L"):
                add("J")
            i += 2 if nxt == "J" else 1
            continue

        if c == "K":
            add("K")
            i += 2 if nxt == "K" else 1
            continue

        if c == "L":
            if nxt == "L":
                # spanish 'llo': cabrillo, gallegos
                if (
                    i == length - 3 and pad[i - 1 : i + 3] in ("ILLO", "ILLA", "ALLE")
                ) or (
                    (pad[length - 2 : length] in ("AS", "OS") or s[-1] in ("A", "O"))
                    and pad[i - 1 : i + 3] == "ALLE"
                ):
                    add("L", "")
                    i += 2
                    continue
                i += 2
            else:
                i += 1
            add("L")
            continue

        if c == "M":
            add("M")
            if (pad[i - 1 : i + 2] == "UMB" and (i + 1 == length - 1 or pad[i + 2 : i + 4] == "ER")) or nxt == "M":
                i += 2
            else:
                i += 1
            continue

        if c == "N":
            add("N")
            i += 2 if nxt == "N" else 1
            continue

        if c == "\xd1":
            add("N")
            i += 1
            continue

        if c == "P":
            if nxt == "H":
                add("F")
                i += 2
                continue
            add("P")
            i += 2 if nxt in ("P", "B") else 1
            continue

        if c == "Q":
            add("K")
            i += 2 if nxt == "Q" else 1
            continue

        if c == "R":
            if i == length - 1 and not _slavo_germanic(s) and pad[i - 2 : i] == "IE" and pad[
                i - 4 : i - 2] not in ("ME", "MA"):
                add("", "R")
            else:
                add("R")
            i += 2 if nxt == "R" else 1
            continue

        if c == "S":
            if pad[i - 1 : i + 2] in ("ISL", "YSL"):
                i += 1
                continue
            if i == 0 and pad[i : i + 5] == "SUGAR":
                add("X", "S")
                i += 1
                continue
            if pad[i : i + 2] == "SH":
                if pad[i + 1 : i + 5] in ("HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")
                else:
                    add("X")
                i += 2
                continue
            if pad[i : i + 3] in ("SIO", "SIA") or pad[i : i + 4] == "SIAN":
                if _slavo_germanic(s):
                    add("S")
                else:
                    add("S", "X")
                i += 3
                continue
            if (i == 0 and nxt in ("M", "N", "L", "W")) or nxt == "Z":
                add("S", "X")
                i += 2 if nxt == "Z" else 1
                continue
            if pad[i : i + 2] == "SC":
                if pad[i + 2] == "H":
                    if pad[i + 3 : i + 5] in ("OO", "ER", "EN", "UY", "ED", "EM"):
                        if pad[i + 3 : i + 5] in ("ER", "EN"):
                            add("X", "SK")
                        else:
                            add("SK")
                    else:
                        if i == 0 and not _is_vowel(s, 3) and pad[3] != "W":
                            add("X", "S")
                        else:
                            add("X")
                    i += 3
                    continue
                if pad[i + 2] in ("I", "E", "Y"):
                    add("S")
                    i += 3
                    continue
                add("SK")
                i += 3
                continue
            if i == length - 1 and pad[i - 2 : i] in ("AI", "OI"):
                add("", "S")
            else:
                add("S")
            i += 2 if nxt in ("S", "Z") else 1
            continue

        if c == "T":
            if pad[i : i + 4] == "TION":
                add("X")
                i += 3
                continue
            if pad[i : i + 3] in ("TIA", "TCH"):
                add("X")
                i += 3
                continue
            if pad[i : i + 2] == "TH" or pad[i : i + 3] == "TTH":
                if pad[i + 2 : i + 4] in ("OM", "AM") or pad[0:4] in ("VAN ", "VON ") or pad[0:3] == "SCH":
                    add("T")
                else:
                    add("0", "T")
                i += 2
                continue
            add("T")
            i += 2 if nxt in ("T", "D") else 1
            continue

        if c == "V":
            add("F")
            i += 2 if nxt == "V" else 1
            continue

        if c == "W":
            if pad[i : i + 2] == "WR":
                add("R")
                i += 2
                continue
            if i == 0 and (_is_vowel(s, 1) or pad[i : i + 2] == "WH"):
                if _is_vowel(s, 1):
                    add("A", "F")
                else:
                    add("A")
                i += 1
                continue
            if (
                (i == length - 1 and _is_vowel(s, i - 1))
                or pad[i - 1 : i + 4] in ("EWSKI", "EWSKY", "OWSKI", "OWSKY")
                or pad[0:3] == "SCH"
            ):
                add("", "F")
                i += 1
                continue
            if pad[i : i + 4] in ("WICZ", "WITZ"):
                add("TS", "FX")
                i += 4
                continue
            i += 1
            continue

        if c == "X":
            if not (i == length - 1 and (pad[i - 3 : i] in ("IAU", "EAU") or pad[i - 2 : i] in ("AU", "OU"))):
                add("KS")
            i += 2 if nxt in ("C", "X") else 1
            continue

        if c == "Z":
            if nxt == "H":
                add("J")
                i += 2
                continue
            if pad[i + 1 : i + 3] in ("ZO", "ZI", "ZA") or (_slavo_germanic(s) and i > 0 and pad[i - 1] != "T"):
                add("S", "TS")
            else:
                add("S")
            i += 2 if nxt == "Z" else 1
            continue

        i += 1

    p = "".join(pri)
    a = "".join(alt)
    if max_length:
        p, a = p[:max_length], a[:max_length]
    return (p, a if a else p)


def dmetaphone(value: str) -> str:
    return double_metaphone(value)[0]


def dmetaphone_alt(value: str) -> str:
    return double_metaphone(value)[1]
