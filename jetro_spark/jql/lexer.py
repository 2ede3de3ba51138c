"""JQL tokenizer (reference grammar: jetro-core/src/grammar.pest).

Keywords, idents, int/float literals, single/double-quoted strings,
f-strings (captured raw — interpolations split in the parser), and the
multi-char operator set. Whitespace-insensitive.
"""

from __future__ import annotations

from dataclasses import dataclass

KEYWORDS = {
    "and", "or", "not", "for", "in", "if", "else", "let", "lambda",
    "kind", "is", "as", "when", "patch", "DELETE", "try", "has",
    "true", "false", "null",
}

# longest-first
PUNCT = [
    "...**", "...", "..", "|>", "->", "=>", "??", "?|", "==", "!=",
    ">=", "<=", "~=", "$", "@", ".", "[", "]", "{", "}", "(", ")",
    ",", ":", "?", "!", "+", "-", "*", "/", "%", "<", ">", "|", "=",
]


@dataclass
class Token:
    kind: str  # ident | kw | int | float | str | fstr | punct | eof
    value: str
    pos: int


class LexError(ValueError):
    pass


def tokenize(src: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c in " \t\r\n":
            i += 1
            continue
        # f-string
        if c == "f" and i + 1 < n and src[i + 1] == '"':
            j = i + 2
            while j < n and src[j] != '"':
                j += 2 if src[j] == "\\" else 1
            if j >= n:
                raise LexError(f"unterminated f-string at {i}")
            toks.append(Token("fstr", src[i + 2 : j], i))
            i = j + 1
            continue
        if c in "\"'":
            j = i + 1
            buf = []
            while j < n and src[j] != c:
                if src[j] == "\\" and j + 1 < n:
                    esc = src[j + 1]
                    buf.append({"n": "\n", "t": "\t", "r": "\r"}.get(esc, esc))
                    j += 2
                else:
                    buf.append(src[j])
                    j += 1
            if j >= n:
                raise LexError(f"unterminated string at {i}")
            toks.append(Token("str", "".join(buf), i))
            i = j + 1
            continue
        # ASCII digits only, like the reference's pest grammar: Python's
        # str.isdigit() also accepts superscripts/Eastern Arabic numerals,
        # which int() then rejects — an uncontrolled ValueError on fuzz
        # input (e.g. '¹').
        if "0" <= c <= "9":
            j = i
            while j < n and "0" <= src[j] <= "9":
                j += 1
            if j < n and src[j] == "." and j + 1 < n and "0" <= src[j + 1] <= "9":
                j += 1
                while j < n and "0" <= src[j] <= "9":
                    j += 1
                toks.append(Token("float", src[i:j], i))
            else:
                toks.append(Token("int", src[i:j], i))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] in "_-"):
                # field_char includes '-' but ident doesn't; only consume '-'
                # when followed by alnum AND we're in a field position — the
                # parser handles that; at lex level treat '-' as separator.
                if src[j] == "-":
                    break
                j += 1
            word = src[i:j]
            toks.append(Token("kw" if word in KEYWORDS else "ident", word, i))
            i = j
            continue
        for p in PUNCT:
            if src.startswith(p, i):
                toks.append(Token("punct", p, i))
                i += len(p)
                break
        else:
            raise LexError(f"unexpected character {c!r} at {i}")
    toks.append(Token("eof", "", n))
    return toks
