"""Whitespace tokenization constants shared by every operator whose
DuckDB oracle twin must match bit-for-bit.

Java regex ``\\s`` is the 6-char ASCII class ``[ \\t\\n\\x0B\\f\\r]``;
RE2 (DuckDB's regex engine) ``\\s`` is the 5-char class WITHOUT \\x0B
(vertical tab). A document containing a vertical tab would therefore
tokenize differently in Spark and in its oracle twin if either side
wrote the bare ``\\s`` escape. Both sides spell the SAME explicit 6-char
class instead: the constants below on the Spark side, the literal class
inside the SQL twins (plans/entry_queries.py). Java semantics are
unchanged — the class IS Java's ``\\s`` — so frozen goldens are
unaffected; only the RE2 twins gain the \\x0B member, making
tokenization engine-identical by construction. Both engines accept the
``\\xhh`` escape inside a character class.
"""

# Java \s, spelled explicitly (identical meaning in Java and RE2).
WS = r"[ \t\n\x0B\f\r]"
WS_PLUS = WS + "+"
# Java \S, spelled explicitly.
NONWS = r"[^ \t\n\x0B\f\r]"
NONWS_PLUS = NONWS + "+"
# The raw member chars, for use inside larger character classes.
WS_CHARS = r" \t\n\x0B\f\r"
