"""Query AST — the analogue of the reference's TermMatchNode
(/root/reference/inc/BitFunnel/Plan/TermMatchNode.h:45-63): And, Or, Not,
Phrase, Unigram (our Term), Fact (our filter-stream Term)."""

from __future__ import annotations

from dataclasses import dataclass, field

DEFAULT_STREAM = "body"
STREAMS = ("body", "path", "lang", "repo", "fact")


class Node:
    pass


@dataclass(frozen=True)
class Term(Node):
    text: str
    stream: str = DEFAULT_STREAM

    @property
    def key(self) -> str:
        return f"{self.stream}:{self.text}"


@dataclass(frozen=True)
class Phrase(Node):
    """``"t1 .. tn"`` — ordered adjacency when ``slop`` is 0 (the exact
    phrase). ``"t1 .. tn"~s`` (slop s > 0, Lucene sloppy-phrase shape, our
    semantics): positions p1 < p2 < ... < pn exist with total span
    pn - p1 <= (n-1) + s — order preserved, up to ``s`` extra tokens
    interleaved anywhere."""

    tokens: tuple[str, ...]
    stream: str = DEFAULT_STREAM
    slop: int = 0

    @property
    def text(self) -> str:
        return " ".join(self.tokens)


@dataclass(frozen=True)
class PhrasePrefix(Node):
    """``"quick bro*"`` — a phrase whose LAST position is a prefix (the
    Elasticsearch match_phrase_prefix / search-as-you-type shape). Resolved
    by plans/expand.py before planning: the prefix expands against the term
    dictionary ((df desc, term asc), capped at max_expansions — the same
    convention as Prefix) into an OR of full phrases, so matching and
    scoring compose with the existing phrase machinery (positional kernel /
    indexed grams / distributed fallback) and the standard OR-of-phrases
    scoring semantics. Slop is intentionally unsupported (QueryParseError):
    slop × prefix would multiply the offset-pattern space."""

    tokens: tuple[str, ...]  # fixed leading tokens (>= 1)
    prefix: str  # trailing prefix text, without the '*'
    stream: str = DEFAULT_STREAM


@dataclass(frozen=True)
class SynGroup(Node):
    """A synonym group with Lucene SynonymQuery semantics: MATCHES like an
    OR of its member terms, SCORES as one pseudo-term — per-document tf is
    the SUM of member tfs, saturated once, weighted by the BLENDED idf
    (idf of the group's max df ≡ min member idf). Produced only by
    plans/expand.apply_synonyms(mode="blend"); the reference has no scorer
    (ResultsBuffer is an unscored match set), so the analogue here is
    Lucene's SynonymQuery(blended df), vs the default expansion semantics
    (OR of independently-scored terms) — SURVEY §2.7."""

    children: tuple[Term, ...]  # all same-stream Terms

    @property
    def keys(self) -> tuple[tuple[str, str], ...]:
        return tuple((t.stream, t.text) for t in self.children)


@dataclass(frozen=True)
class FieldGroup(Node):
    """A combined-fields group (BM25F; Elasticsearch ``combined_fields``,
    Zaragoza et al. 2004 "simple BM25F"): MATCHES like an OR of the same
    token across several fields, SCORES as ONE pseudo-term — per-document
    tf̃ = Σ_f w_f·tf_f (weighted sum in fixed sorted-member order),
    saturated ONCE with the document's shared body-length norm, weighted
    by the BLENDED idf (min member idf ≡ idf of the max per-field df —
    the same blended-docFreq convention as SynGroup). The engine stores
    one body-length norm per document (doclen is the BODY token count on
    every posting, operators/statistics.py), so the per-field norms of
    full BM25F coincide and the weighted tf sum is exact. Produced by
    plans/expand.combined_fields; the reference has no scorer (its
    ResultsBuffer is an unscored match set), so the analogue is Lucene's
    CombinedFieldQuery — SURVEY §2.7."""

    children: tuple[Term, ...]  # one Term per field, same token
    weights: tuple[float, ...]  # aligned with children; all > 0

    @property
    def keys(self) -> tuple[tuple[str, str], ...]:
        return tuple((t.stream, t.text) for t in self.children)

    @property
    def weighted(self) -> tuple[tuple[tuple[str, str], float], ...]:
        """((stream, term), weight) pairs in sorted key order — the fixed
        accumulation order every scorer (kernel, DataFrame, SQL oracle)
        shares so float64 results stay bit-identical."""
        return tuple(
            sorted(
                (((t.stream, t.text), float(w)) for t, w in zip(self.children, self.weights)),
                key=lambda kw: kw[0],
            )
        )


@dataclass(frozen=True)
class Prefix(Node):
    """``text*`` — expands to every dictionary term starting with ``text``
    (Lucene PrefixQuery shape; resolved by plans/expand.py before
    planning)."""

    text: str  # the prefix, without the trailing '*'
    stream: str = DEFAULT_STREAM


@dataclass(frozen=True)
class Wildcard(Node):
    """``d?t*a`` — expands to every dictionary term matching the glob
    pattern (``*`` = any run, ``?`` = one char; Lucene WildcardQuery
    shape; resolved by plans/expand.py before planning). A pattern whose
    only wildcard is one trailing ``*`` parses as the cheaper Prefix."""

    text: str  # the glob pattern, wildcards included
    stream: str = DEFAULT_STREAM


@dataclass(frozen=True)
class Regex(Node):
    """``/s[ck]an/`` — expands to every dictionary term fully matching the
    regular expression (Lucene RegexpQuery shape — whole-term anchored;
    resolved by plans/expand.py before planning). Regex metachars that are
    query-grammar specials (``( ) | & " -`` and space) must be
    backslash-escaped in the query string."""

    text: str  # the regex body, without the surrounding slashes
    stream: str = DEFAULT_STREAM


@dataclass(frozen=True)
class Fuzzy(Node):
    """``text~`` / ``text~2`` — expands to dictionary terms within edit
    distance ``dist`` (Lucene FuzzyQuery shape; resolved by
    plans/expand.py before planning)."""

    text: str
    stream: str = DEFAULT_STREAM
    dist: int = 1


@dataclass(frozen=True)
class Boost(Node):
    """``term^2`` — multiplies the wrapped term's BM25 contribution
    (Lucene query-time boost). The planner strips Boost nodes into
    ``QueryPlan.boosts`` before matching; match semantics are unchanged."""

    child: Node  # a Term (the parser only boosts plain unigrams)
    factor: float = 1.0


@dataclass(frozen=True)
class Filter(Node):
    """``#clause`` — filter context (the Elasticsearch bool-``filter``
    clause): the wrapped clause constrains the MATCH SET exactly like a
    positive clause but contributes nothing to the BM25 score. The planner
    strips Filter wrappers after recording their positive keys; a key both
    filtered and unfiltered in the same query still scores (ES must +
    filter semantics). Non-body stream terms are implicitly filter-context
    already (planner: only body/boosted keys score); ``#`` extends that
    control to body terms. A Boost inside a Filter is ignored (the filter
    wins; nothing to boost in a scoreless clause)."""

    child: Node


@dataclass(frozen=True)
class And(Node):
    children: tuple[Node, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class Or(Node):
    """Disjunction; ``min_match`` > 1 makes it a minimum-should-match group
    (Lucene minimumShouldMatch): a doc matches when at least ``min_match``
    children match. Parser syntax: ``(a | b | c)@2``."""

    children: tuple[Node, ...] = field(default_factory=tuple)
    min_match: int = 1


@dataclass(frozen=True)
class Not(Node):
    child: Node


def fmt(node: Node) -> str:
    """Compact printable form (mirrors the reference's test golden format —
    QueryParserTest.cpp renders ASTs as strings)."""
    if isinstance(node, Term):
        return node.text if node.stream == DEFAULT_STREAM else f"{node.stream}:{node.text}"
    if isinstance(node, Phrase):
        body = '"' + " ".join(node.tokens) + '"'
        if node.slop:
            body += f"~{node.slop}"
        return body if node.stream == DEFAULT_STREAM else f"{node.stream}:{body}"
    if isinstance(node, PhrasePrefix):
        body = '"' + " ".join(node.tokens + (node.prefix + "*",)) + '"'
        return body if node.stream == DEFAULT_STREAM else f"{node.stream}:{body}"
    if isinstance(node, Boost):
        return f"{fmt(node.child)}^{node.factor:g}"
    if isinstance(node, Prefix):
        body = f"{node.text}*"
        return body if node.stream == DEFAULT_STREAM else f"{node.stream}:{body}"
    if isinstance(node, Fuzzy):
        body = f"{node.text}~{node.dist}"
        return body if node.stream == DEFAULT_STREAM else f"{node.stream}:{body}"
    if isinstance(node, Wildcard):
        return node.text if node.stream == DEFAULT_STREAM else f"{node.stream}:{node.text}"
    if isinstance(node, Regex):
        body = f"/{node.text}/"
        return body if node.stream == DEFAULT_STREAM else f"{node.stream}:{body}"
    if isinstance(node, Filter):
        return f"#({fmt(node.child)})"
    if isinstance(node, Not):
        return f"Not({fmt(node.child)})"
    if isinstance(node, And):
        return "And(" + ", ".join(fmt(c) for c in node.children) + ")"
    if isinstance(node, Or):
        body = "Or(" + ", ".join(fmt(c) for c in node.children) + ")"
        return body if node.min_match <= 1 else f"{body}@{node.min_match}"
    raise TypeError(type(node))
