"""Pure-Python Turtle well-formedness validator.

The reference validates every produced Turtle file with Apache Jena
``riot --validate`` (/root/reference/src/validate_everything.bash:6-10,
Dockerfile:18).  Jena is not available in this environment; this module
implements the same gate for the serializer's output dialect —
tokenizer-level checks (IRI and string escaping, comment handling) plus
a statement-grammar walk (prefix declarations, subject / predicate /
object structure, ``;`` / ``,`` continuation, ``.`` termination,
declared-prefix use).  It accepts standard Turtle minus blank-node
property lists and collections (the serializer never emits those; they
are reported as errors so unexpected output shapes surface loudly).

Byte-parity tests catch regressions where a golden exists; this
validator catches escaping/structure regressions on NOVEL inputs
(round-2 VERDICT missing #3).
"""

from __future__ import annotations

import re

_IRI_FORBIDDEN = set('<>"{}|^`\\') | {chr(c) for c in range(0x21)}
_STRING_ESCAPES = set('tbnrf"\'\\')
_PNAME = re.compile(r"^[A-Za-z_][\w.-]*$")
# numeric / boolean literals (Turtle short forms)
_NUM = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")


def _err(errors: list, line_no: int, msg: str) -> None:
    errors.append(f"line {line_no}: {msg}")


def tokenize(ttl: str) -> tuple[list[tuple[int, str, str]], list[str]]:
    """→ ([(line_no, kind, text)], errors).  kind ∈ {'iri', 'string',
    'punct', 'word'}; comments are skipped; literal suffixes
    (@lang / ^^type) are folded into the preceding string token."""
    toks: list[tuple[int, str, str]] = []
    errors: list[str] = []
    i, n, line_no = 0, len(ttl), 1
    while i < n:
        c = ttl[i]
        if c == "\n":
            line_no += 1
            i += 1
        elif c in " \t\r":
            i += 1
        elif c == "#":
            while i < n and ttl[i] != "\n":
                i += 1
        elif c == "<":
            j = i + 1
            while j < n and ttl[j] != ">":
                ch = ttl[j]
                if ch == "\\":
                    # IRIREF allows only \uXXXX / \UXXXXXXXX
                    esc = ttl[j + 1: j + 2]
                    if esc not in ("u", "U"):
                        _err(errors, line_no, f"bad IRI escape '\\{esc}'")
                    j += 2
                    continue
                if ch in _IRI_FORBIDDEN or ch == "\n":
                    _err(errors, line_no,
                         f"forbidden character {ch!r} in IRI")
                    if ch == "\n":
                        break
                j += 1
            if j >= n or ttl[j] != ">":
                _err(errors, line_no, "unterminated IRI")
                i = j
            else:
                toks.append((line_no, "iri", ttl[i: j + 1]))
                i = j + 1
        elif c == '"':
            j = i + 1
            closed = False
            while j < n:
                ch = ttl[j]
                if ch == "\\":
                    esc = ttl[j + 1: j + 2]
                    if esc in _STRING_ESCAPES:
                        j += 2
                    elif esc == "u":
                        if not re.match(r"^[0-9A-Fa-f]{4}",
                                        ttl[j + 2: j + 6]):
                            _err(errors, line_no, "bad \\u escape")
                        j += 6
                    elif esc == "U":
                        if not re.match(r"^[0-9A-Fa-f]{8}",
                                        ttl[j + 2: j + 10]):
                            _err(errors, line_no, "bad \\U escape")
                        j += 10
                    else:
                        _err(errors, line_no,
                             f"bad string escape '\\{esc}'")
                        j += 2
                elif ch == '"':
                    closed = True
                    break
                elif ch == "\n":
                    break
                else:
                    j += 1
            if not closed:
                _err(errors, line_no, "unterminated string literal")
                i = j
                continue
            text = ttl[i: j + 1]
            i = j + 1
            # @lang or ^^datatype suffix
            m = re.match(r"@[A-Za-z]+(-[A-Za-z0-9]+)*", ttl[i:])
            if m:
                text += m.group(0)
                i += m.end()
            elif ttl[i: i + 2] == "^^":
                text += "^^"
                i += 2  # datatype IRI follows as its own token
            toks.append((line_no, "string", text))
        elif c in ";,.[]()":
            toks.append((line_no, "punct", c))
            i += 1
        else:
            j = i
            while j < n and ttl[j] not in ' \t\r\n<>"#;,()[]':
                j += 1
            if j == i:  # lone forbidden char (e.g. stray '>')
                _err(errors, line_no, f"unexpected character {c!r}")
                i += 1
            else:
                toks.append((line_no, "word", ttl[i:j]))
                i = j
    return toks, errors


def _is_term(kind: str, text: str, prefixes: set[str],
             errors: list, line_no: int, what: str) -> bool:
    """IRI, prefixed name, literal, or number — the only object forms
    the dialect allows."""
    if kind in ("iri", "string"):
        return True
    if kind == "word":
        if text in ("true", "false") or _NUM.match(text):
            return True
        if ":" in text:
            p = text.split(":", 1)[0]
            if p not in prefixes:
                _err(errors, line_no,
                     f"undeclared prefix '{p}:' in {what} '{text}'")
            return True
    _err(errors, line_no, f"invalid {what} '{text}'")
    return False


def validate_turtle(ttl: str) -> list[str]:
    """→ list of error messages ([] = well-formed)."""
    toks, errors = tokenize(ttl)
    prefixes: set[str] = set()
    i, n = 0, len(toks)
    while i < n:
        line_no, kind, text = toks[i]
        if kind == "word" and text in ("@prefix", "@base", "PREFIX", "BASE"):
            # @prefix p: <iri> .
            if text in ("@prefix", "PREFIX"):
                if i + 2 < n and toks[i + 1][1] == "word" \
                        and toks[i + 1][2].endswith(":") \
                        and toks[i + 2][1] == "iri":
                    name = toks[i + 1][2][:-1]
                    if name and not _PNAME.match(name):
                        _err(errors, line_no, f"bad prefix name '{name}'")
                    prefixes.add(name)
                    i += 3
                else:
                    _err(errors, line_no, "malformed @prefix directive")
                    i += 1
                    continue
            else:
                if i + 1 < n and toks[i + 1][1] == "iri":
                    i += 2
                else:
                    _err(errors, line_no, "malformed @base directive")
                    i += 1
                    continue
            if text.startswith("@"):
                if i < n and toks[i][1] == "punct" and toks[i][2] == ".":
                    i += 1
                else:
                    _err(errors, line_no, "@-directive not '.'-terminated")
            continue
        # statement: subject  (pred obj ("," obj)* )(";" ...)* "."
        if not (kind == "iri" or (kind == "word" and ":" in text)):
            _err(errors, line_no, f"invalid subject '{text}'")
            i += 1
            continue
        _is_term(kind, text, prefixes, errors, line_no, "subject")
        i += 1
        terminated = False
        while i < n:
            # predicate
            pl, pk, pt = toks[i]
            if pk == "punct" and pt == ".":
                _err(errors, pl, "statement with no predicate-object")
                i += 1
                terminated = True
                break
            if not (pk == "iri" or (pk == "word"
                                    and (pt == "a" or ":" in pt))):
                _err(errors, pl, f"invalid predicate '{pt}'")
                break
            if pk == "word" and pt != "a":
                _is_term(pk, pt, prefixes, errors, pl, "predicate")
            i += 1
            # object list
            while i < n:
                ol, ok, ot = toks[i]
                _is_term(ok, ot, prefixes, errors, ol, "object")
                i += 1
                if ot.endswith("^^"):  # datatype IRI follows
                    if i < n and toks[i][1] == "iri":
                        i += 1
                    else:
                        _err(errors, ol, "missing datatype IRI after ^^")
                if i < n and toks[i][1] == "punct" and toks[i][2] == ",":
                    i += 1
                    continue
                break
            if i < n and toks[i][1] == "punct":
                if toks[i][2] == ";":
                    i += 1
                    # trailing ';' before '.' is legal Turtle
                    if i < n and toks[i][1] == "punct" \
                            and toks[i][2] == ".":
                        i += 1
                        terminated = True
                        break
                    continue
                if toks[i][2] == ".":
                    i += 1
                    terminated = True
                    break
            _err(errors, toks[min(i, n - 1)][0],
                 "expected ';', ',' or '.' in predicate-object list")
            break
        if not terminated and i >= n:
            _err(errors, toks[n - 1][0], "unterminated statement at EOF")
    return errors
