r"""Recursive-descent query parser — the reference grammar
(/root/reference/inc/BitFunnel/Plan/QueryParser.h:79-104,
src/Plan/src/QueryParser.cpp):

    OR     := AND ( '|' AND )*
    AND    := SIMPLE ( '&'? SIMPLE )*
    SIMPLE := '-' SIMPLE | '(' OR ')' | TERM
    TERM   := [stream:]unigram | [stream:]'"' unigram+ '"'

Unigram characters: anything except space and the specials ``& | ( ) " -``;
``\`` escapes the next character. Terms are lowercased (the engine tokenizes
lowercased text). Driver-side pure Python — no Spark here.

Engine extension beyond the reference grammar: a unigram with a trailing
``*`` is a prefix wildcard (``dat*``), one with ``*``/``?`` elsewhere a
general glob (``d?t*a``), and a trailing ``~``/``~2`` a fuzzy term (edit
distance 1/2). All expand against the term dictionary (plans/expand.py)
into an OR of matching terms before planning.
"""

from __future__ import annotations

import re

from bitfunnel_spark.plans.ast import (
    DEFAULT_STREAM,
    STREAMS,
    And,
    Boost,
    Filter,
    Fuzzy,
    Node,
    Not,
    Or,
    Phrase,
    PhrasePrefix,
    Prefix,
    Regex,
    Term,
    Wildcard,
)

SPECIALS = set('&|()"- \t\n\r')
_FUZZY_RE = re.compile(r"([^~*]+)~([0-9]?)")
_BOOST_RE = re.compile(r"(.+)\^([0-9]+(?:\.[0-9]+)?)")


class QueryParseError(ValueError):
    pass


class _Parser:
    def __init__(self, text: str):
        self.s = text
        self.i = 0

    def peek(self) -> str | None:
        return self.s[self.i] if self.i < len(self.s) else None

    def skip_ws(self) -> None:
        while self.i < len(self.s) and self.s[self.i] in " \t\n\r":
            self.i += 1

    def expect(self, ch: str) -> None:
        if self.peek() != ch:
            raise QueryParseError(f"expected {ch!r} at offset {self.i} in {self.s!r}")
        self.i += 1

    def parse_or(self) -> Node:
        children = [self.parse_and()]
        while True:
            self.skip_ws()
            if self.peek() == "|":
                self.i += 1
                children.append(self.parse_and())
            else:
                break
        return children[0] if len(children) == 1 else Or(tuple(children))

    def parse_and(self) -> Node:
        children = [self.parse_simple()]
        while True:
            self.skip_ws()
            c = self.peek()
            if c == "&":
                self.i += 1
                children.append(self.parse_simple())
            elif c is not None and c not in "|)":
                children.append(self.parse_simple())
            else:
                break
        return children[0] if len(children) == 1 else And(tuple(children))

    def parse_simple(self) -> Node:
        self.skip_ws()
        c = self.peek()
        if c is None:
            raise QueryParseError(f"unexpected end of query: {self.s!r}")
        if c == "-":
            self.i += 1
            return Not(self.parse_simple())
        if c == "#":  # '#clause' — filter context (matches, never scores)
            self.i += 1
            return Filter(self.parse_simple())
        if c == "(":
            self.i += 1
            node = self.parse_or()
            self.skip_ws()
            self.expect(")")
            if self.peek() == "@":  # '(a | b | c)@2' — minimum-should-match
                self.i += 1
                digits = []
                while self.peek() is not None and self.peek().isdigit():
                    digits.append(self.s[self.i])
                    self.i += 1
                if not digits:
                    raise QueryParseError("expected a count after '@'")
                m = int("".join(digits))
                if not isinstance(node, Or):
                    raise QueryParseError(
                        "min-should-match '@N' requires an OR group of 2+ terms"
                    )
                if m > 1:
                    node = Or(node.children, m)
            return node
        return self.parse_term()

    def parse_unigram(self) -> str:
        out = []
        while self.i < len(self.s):
            c = self.s[self.i]
            if c == "\\":
                if self.i + 1 >= len(self.s):
                    raise QueryParseError("trailing escape")
                out.append(self.s[self.i + 1])
                self.i += 2
                continue
            if c in SPECIALS or c == ":":
                break
            out.append(c)
            self.i += 1
        if not out:
            raise QueryParseError(f"empty term at offset {self.i} in {self.s!r}")
        return "".join(out).lower()

    def parse_term(self) -> Node:
        stream = DEFAULT_STREAM
        save = self.i
        word = self.parse_unigram() if self.peek() != '"' else None
        if word is not None and self.peek() == ":":
            if word not in STREAMS:
                raise QueryParseError(f"unknown stream {word!r} (valid: {STREAMS})")
            stream = word
            self.i += 1
            word = None
            save = self.i
        if word is None and self.peek() == '"':
            self.i += 1
            tokens = []
            is_prefix = False
            while True:
                self.skip_ws()
                if self.peek() == '"':
                    self.i += 1
                    break
                if self.peek() is None:
                    raise QueryParseError("unterminated phrase")
                tok = self.parse_unigram()
                # '"quick bro*"' — match_phrase_prefix: '*' must close the
                # LAST token ('"a* b"' is an error, not a silent never-match)
                if "*" in tok or "?" in tok:
                    core = tok[:-1]
                    if not (tok.endswith("*") and core and "*" not in core and "?" not in core):
                        raise QueryParseError(
                            f"only a trailing '*' on the last phrase token is "
                            f"supported inside phrases: {tok!r}"
                        )
                    tokens.append(core)
                    is_prefix = True
                    self.skip_ws()
                    if self.peek() != '"':
                        raise QueryParseError(
                            "phrase-prefix '*' must end the phrase"
                        )
                    self.i += 1
                    break
                tokens.append(tok)
            if not tokens:
                raise QueryParseError("empty phrase")
            slop = 0
            if self.peek() == "~":  # '"a b"~2' — sloppy phrase (proximity)
                if is_prefix:
                    raise QueryParseError("cannot combine phrase-prefix and slop")
                self.i += 1
                digits = []
                while self.peek() is not None and self.peek().isdigit():
                    digits.append(self.s[self.i])
                    self.i += 1
                slop = int("".join(digits) or "1")
            if is_prefix:
                if len(tokens) == 1:
                    return Prefix(tokens[0], stream)  # '"bro*"' == bro*
                return PhrasePrefix(tuple(tokens[:-1]), tokens[-1], stream)
            if len(tokens) == 1:
                return Term(tokens[0], stream)
            return Phrase(tuple(tokens), stream, slop)
        if word is None:
            self.i = save
            word = self.parse_unigram()
        # engine extensions beyond the reference grammar: a trailing '^N'
        # is a query-time scoring boost (Lucene boost); a trailing '*' a
        # prefix wildcard, a trailing '~' (optionally '~2') a fuzzy term
        # (Lucene PrefixQuery/FuzzyQuery shapes, resolved against the term
        # dictionary by plans/expand.py).
        bm = _BOOST_RE.fullmatch(word)
        if bm:
            inner = bm.group(1)
            if (
                "*" in inner
                or "?" in inner
                or inner.startswith("/")
                or inner.endswith("~")
                or _FUZZY_RE.fullmatch(inner)
            ):
                raise QueryParseError(
                    f"boost on an expansion term is not supported: {word!r}"
                )
            return Boost(Term(inner, stream), float(bm.group(2)))
        if word.endswith("*") and len(word) > 1 and "*" not in word[:-1] and "?" not in word:
            return Prefix(word[:-1], stream)
        if len(word) >= 3 and word.startswith("/") and word.endswith("/"):
            # /regex/ — whole-term regex (Lucene RegexpQuery shape). '/'
            # never appears in tokens (TOKEN_PATTERN), so this cannot
            # shadow a literal term. Validate driver-side so a broken
            # pattern fails at parse time, not inside a Spark task.
            body = word[1:-1]
            try:
                re.compile(body)
            except re.error as ex:
                raise QueryParseError(f"invalid regex {body!r}: {ex}") from None
            return Regex(body, stream)
        if "*" in word or "?" in word:
            # general glob (Lucene WildcardQuery shape): '*' any run, '?' one
            # char, anywhere in the token. Requires at least one literal char
            # (a bare '*' would expand to the whole dictionary).
            if not word.strip("*?"):
                raise QueryParseError(f"wildcard needs at least one literal char: {word!r}")
            if "~" in word:
                # 'da?a~' would otherwise become a Wildcard containing a
                # literal '~' that can never tokenize — fail loudly like the
                # boost-on-expansion case above
                raise QueryParseError(
                    f"cannot combine wildcard and fuzzy suffix: {word!r}"
                )
            return Wildcard(word, stream)
        m = _FUZZY_RE.fullmatch(word)
        if m:
            return Fuzzy(m.group(1), stream, int(m.group(2) or 1))
        return Term(word, stream)


def parse_query(text: str) -> Node:
    p = _Parser(text)
    node = p.parse_or()
    p.skip_ws()
    if p.peek() is not None:
        raise QueryParseError(f"trailing input at offset {p.i} in {text!r}")
    return node
