"""Per-rune titlecase map shared by both `.capitalize()` engines.

Go strings.Title (methods_strings.go:61) titlecases the first rune of
each word with unicode.ToTitle — a SIMPLE single-rune mapping that
differs from simple uppercase for the titlecase digraphs (Ǆǅǆ → ǅ,
ǇǈǊǋǱǲ families), keeps Georgian mkhedruli lowercase (its titlecase
is itself, NOT the Mtavruli uppercase), and maps the Greek
prosgegrammeni composites (ᾀ → ᾈ, ᾳ → ᾼ, …) whose FULL uppercase is
two characters.  `upper()` + a length-1 guard gets all of these wrong
(r8 ADVICE), so both engines consult TITLE_MAP first and fall back to
uppercase-with-guard for everything else.

The table is derived, not hand-typed: every BMP codepoint whose
Python single-char `str.title()` (the simple/Unicode titlecase
mapping when it is one char) disagrees with what upper-with-guard
would produce.  85 entries; astral-plane runes stay excluded (the
compiled engine sees them as surrogate halves — the documented
deviation in functions/strings.py)."""

from __future__ import annotations


def _build() -> dict[str, str]:
    m: dict[str, str] = {}
    for cp in range(0x10000):
        c = chr(cp)
        t, u = c.title(), c.upper()
        current = u if len(u) == 1 else c
        desired = t if len(t) == 1 else c
        if desired != current:
            m[c] = desired
    return m


TITLE_MAP: dict[str, str] = _build()
