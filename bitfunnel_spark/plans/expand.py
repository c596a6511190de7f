"""Dictionary-driven query expansion: prefix (``dat*``), glob wildcard
(``d?t*a``), regex (``/s[ck]an/``) and fuzzy (``term~``/``term~2``) terms.

The public design this follows is Lucene's MultiTermQuery rewrite:
PrefixQuery / WildcardQuery / RegexpQuery / FuzzyQuery enumerate matching
dictionary terms and rewrite into a boolean OR over them, capped at
``max_expansions`` preferring the most frequent terms. (The reference engine has no term dictionary with
retained text — Term.h:44-47 hashes text away — so it cannot offer these;
our dictionary keeps the text precisely to enable them.)

Scale shape: a prefix expansion is ONE filtered scan of the term
dictionary with a pushdown-friendly ``StartsWith`` predicate; a fuzzy
expansion adds a length-band prune (``abs(len(term) - len(q)) <= d``)
before the JVM-side ``levenshtein``. The cap is a Spark-side TakeOrdered
(df desc, term asc) — at most ``max_expansions`` terms reach the driver,
then the rewritten query runs through the normal block-max kernel like any
hand-written OR.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bitfunnel_spark.plans.ast import (
    And,
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

MAX_EXPANSIONS = 64

_RE_META = set(".[]()*+?{}|^$\\")


def _regex_safe_prefix(pattern: str) -> str:
    """Longest literal prefix every match of ``pattern`` must start with.

    Lucene derives the safe common prefix from the compiled automaton
    (CompiledAutomaton.commonPrefix); we derive a conservative one
    syntactically:

    - a top-level unescaped ``|`` means alternation branches need not share
      the lead at all (``scan|data``) → no safe prefix;
    - if the metachar that ends the literal run is a quantifier (``?``,
      ``*``, ``{``), the char before it is optional/repeatable
      (``sc?an`` matches ``san``) → drop the last lead char.

    Returns ``""`` when no sound prefix exists (prune disabled). Used only
    as a pre-filter before the exact anchored ``rlike`` — under-pruning is
    always sound.
    """
    i, depth = 0, 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth = max(0, depth - 1)
        elif c == "|" and depth == 0:
            return ""
        i += 1
    lead: list[str] = []
    stop = None
    for c in pattern:
        if c in _RE_META:
            stop = c
            break
        lead.append(c)
    if lead and stop in ("?", "*", "{"):
        lead.pop()
    return "".join(lead)


def has_expansions(node: Node) -> bool:
    if isinstance(node, (Prefix, Fuzzy, Wildcard, Regex, PhrasePrefix)):
        return True
    if isinstance(node, (Not, Filter)):
        return has_expansions(node.child)
    if isinstance(node, (And, Or)):
        return any(has_expansions(c) for c in node.children)
    return False


def _glob_to_like(pattern: str) -> str:
    """Glob (``*``/``?``) → SQL LIKE pattern. Literal ``%``/``_``/``\\``
    are escaped with ``\\`` (tokens can contain ``_`` — TOKEN_PATTERN)."""
    out = []
    for c in pattern:
        if c == "*":
            out.append("%")
        elif c == "?":
            out.append("_")
        elif c in ("%", "_", "\\"):
            out.append("\\" + c)
        else:
            out.append(c)
    return "".join(out)


def _matching_terms(
    index, node: Prefix | Fuzzy | Wildcard | Regex, max_expansions: int
) -> list[str]:
    ts = index.term_stats.filter(F.col("stream") == node.stream)
    if isinstance(node, Prefix):
        ts = ts.filter(F.col("term").startswith(node.text))
    elif isinstance(node, Regex):
        # sound leading-literal prune (see _regex_safe_prefix: disabled for
        # top-level alternation, trimmed before optional quantifiers) →
        # pushdown-friendly StartsWith before the anchored rlike
        lead = _regex_safe_prefix(node.text)
        if lead:
            ts = ts.filter(F.col("term").startswith(lead))
        ts = ts.filter(F.col("term").rlike(f"^(?:{node.text})$"))
    elif isinstance(node, Wildcard):
        # leading literal run → pushdown-friendly StartsWith prune before
        # the LIKE; a minimum-length bound prunes further (every literal
        # char and every '?' consumes at least one term char)
        lead = node.text.split("*", 1)[0].split("?", 1)[0]
        if lead:
            ts = ts.filter(F.col("term").startswith(lead))
        min_len = sum(1 for c in node.text if c != "*")
        ts = ts.filter(F.length("term") >= min_len).filter(
            F.col("term").like(_glob_to_like(node.text))
        )
    else:
        q, d = node.text, int(node.dist)
        ts = ts.filter(
            (F.length("term") >= len(q) - d) & (F.length("term") <= len(q) + d)
        ).filter(F.levenshtein(F.col("term"), F.lit(q)) <= d)
    rows = (
        ts.select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(max_expansions)
        .collect()
    )
    return [r["term"] for r in rows]


def _expand(index, node: Node, max_expansions: int) -> Node:
    if isinstance(node, PhrasePrefix):
        # match_phrase_prefix: expand the last position against the
        # dictionary (same (df desc, term asc) cap as Prefix), then an OR
        # of full phrases — matching and scoring ride the existing phrase
        # machinery and OR semantics
        terms = _matching_terms(
            index, Prefix(node.prefix, node.stream), max_expansions
        )
        if not terms:
            # no dictionary term matches: a phrase containing a token that
            # cannot tokenize ('*') — empty match set
            return Phrase(node.tokens + (node.prefix + "*",), node.stream)
        if len(terms) == 1:
            return Phrase(node.tokens + (terms[0],), node.stream)
        return Or(
            tuple(Phrase(node.tokens + (t,), node.stream) for t in sorted(terms))
        )
    if isinstance(node, (Prefix, Fuzzy, Wildcard, Regex)):
        terms = _matching_terms(index, node, max_expansions)
        if not terms:
            # no dictionary term matches: rewrite to a token that cannot
            # tokenize ('*'/'?'/'~'/'/' never appear in tokens) — empty
            # posting list
            if isinstance(node, Wildcard):
                marker = node.text
            elif isinstance(node, Regex):
                marker = f"/{node.text}/"
            else:
                marker = node.text + ("*" if isinstance(node, Prefix) else "~")
            return Term(marker, node.stream)
        if len(terms) == 1:
            return Term(terms[0], node.stream)
        return Or(tuple(Term(t, node.stream) for t in sorted(terms)))
    if isinstance(node, Not):
        return Not(_expand(index, node.child, max_expansions))
    if isinstance(node, Filter):
        return Filter(_expand(index, node.child, max_expansions))
    if isinstance(node, And):
        return And(tuple(_expand(index, c, max_expansions) for c in node.children))
    if isinstance(node, Or):
        return Or(
            tuple(_expand(index, c, max_expansions) for c in node.children),
            node.min_match,
        )
    return node  # Term / Phrase


def expand_query(index, node: Node, max_expansions: int = MAX_EXPANSIONS) -> Node:
    """Resolve every Prefix/Fuzzy node against the index's term dictionary,
    returning a plain And/Or/Not/Term/Phrase tree the planner accepts."""
    return _expand(index, node, max_expansions)


def apply_synonyms(
    node: Node, mapping: dict[str, tuple[str, ...]], mode: str = "expand"
) -> Node:
    """Rewrite plain body Terms through a query-time synonym map
    (index.set_synonyms). Two semantics:

    - ``mode="expand"`` (default): Term(t) -> Or(t, s1, ..) — each member
      matches AND scores independently with its own idf (query-expansion
      semantics).
    - ``mode="blend"``: Term(t) -> SynGroup(t, s1, ..) — matches like the
      OR but scores as ONE pseudo-term (summed tf, one saturation, blended
      idf = idf of the group's max df): Lucene SynonymQuery semantics.

    Recurses through And/Or/Not; an Or@N parent counts the group as ONE
    countable child (planner.normalize never flattens across a min-match
    boundary, and SynGroup is atomic). Phrases, boosted terms, and
    expansion nodes (prefix/glob/regex/fuzzy) are left untouched — their
    token identity is the point."""
    from bitfunnel_spark.plans.ast import DEFAULT_STREAM, SynGroup

    if mode not in ("expand", "blend"):
        raise ValueError(f"unknown synonym mode {mode!r}")
    if isinstance(node, Term) and node.stream == DEFAULT_STREAM:
        alts = mapping.get(node.text)
        if alts:
            members = (node, *(Term(t) for t in alts))
            return SynGroup(members) if mode == "blend" else Or(members)
        return node
    if isinstance(node, Not):
        return Not(apply_synonyms(node.child, mapping, mode))
    if isinstance(node, Filter):
        return Filter(apply_synonyms(node.child, mapping, mode))
    if isinstance(node, And):
        return And(tuple(apply_synonyms(c, mapping, mode) for c in node.children))
    if isinstance(node, Or):
        return Or(
            tuple(apply_synonyms(c, mapping, mode) for c in node.children),
            node.min_match,
        )
    return node


def combined_fields(query, field_weights: dict[str, float]) -> Node:
    """Rewrite every plain DEFAULT_STREAM Term into a FieldGroup over the
    given (field -> weight) map — BM25F / Elasticsearch ``combined_fields``
    semantics: the token matches in ANY listed field, and scores as ONE
    pseudo-term over the weighted per-field tf sum with a single
    saturation and a blended idf. ``query`` is a query string or an AST
    node.

    Weights must be > 0. Terms with an explicit field prefix
    (``path:txt``), phrases, and expansion nodes are left untouched —
    the rewrite targets the bag-of-words part of the query, like the
    multi-field query parsers it mirrors. Recurses through And/Or/Not;
    an Or@N parent counts the group as ONE countable child (FieldGroup
    is atomic, planner.normalize never flattens into it)."""
    from bitfunnel_spark.plans.ast import DEFAULT_STREAM, FieldGroup
    from bitfunnel_spark.plans.parser import parse_query

    if isinstance(query, str):
        query = parse_query(query)
    if not field_weights:
        raise ValueError("combined_fields needs at least one field")
    fields = sorted(field_weights)
    weights = tuple(float(field_weights[f]) for f in fields)
    if any(w <= 0 for w in weights):
        raise ValueError(f"combined_fields weights must be > 0: {field_weights}")

    def walk(node: Node) -> Node:
        if isinstance(node, Term) and node.stream == DEFAULT_STREAM:
            return FieldGroup(
                tuple(Term(node.text, stream=f) for f in fields), weights
            )
        if isinstance(node, Not):
            return Not(walk(node.child))
        if isinstance(node, Filter):
            return Filter(walk(node.child))
        if isinstance(node, And):
            return And(tuple(walk(c) for c in node.children))
        if isinstance(node, Or):
            return Or(tuple(walk(c) for c in node.children), node.min_match)
        return node

    return walk(query)


def common_terms_query(index, text: str, max_df_ratio: float = 0.3) -> Node:
    """Stopword-robust bag-of-words query (Lucene CommonTermsQuery shape,
    MUST low-freq / SHOULD high-freq): terms with df/N <= ``max_df_ratio``
    are required (ANDed); higher-df terms only contribute score when
    present. Expressed as a pure rewrite — ``a & (a | b | c)`` for rare
    ``a`` and common ``b c``: the OR clause is implied by ``a`` (match set
    unchanged) but promotes the common terms into the plan's scoring keys,
    so the unmodified executors score MUST+SHOULD exactly. All-common (or
    all-rare) input degrades to a plain AND, as Lucene does.

    ``text`` is a space-separated bag of body terms (no operators). One
    dictionary lookup for the df split; the rewritten query runs through
    the normal block-max kernel.
    """
    terms = [w.lower() for w in text.split() if w]
    if not terms:
        raise ValueError("common_terms_query needs at least one term")
    seen: list[str] = []
    for t in terms:  # de-dupe, keep first occurrence
        if t not in seen:
            seen.append(t)
    rows = (
        index.term_stats.filter(
            (F.col("stream") == "body") & F.col("term").isin(seen)
        )
        .select("term", "df")
        .collect()
    )
    dfs = {r["term"]: int(r["df"]) for r in rows}
    rare = [t for t in seen if dfs.get(t, 0) <= max_df_ratio * index.n_docs]
    common = [t for t in seen if t not in rare]
    if not rare or not common:
        children = tuple(Term(t) for t in seen)
        return children[0] if len(children) == 1 else And(children)
    should = Or(tuple(Term(t) for t in (rare[:1] + common)))
    return And((*(Term(t) for t in rare), should))


def did_you_mean(index, term: str, k: int = 5, max_dist: int = 2):
    """Spell-correction suggester ("did you mean" — the ES/Lucene
    term-suggester shape): dictionary body terms within edit distance
    ``max_dist`` of ``term``, the input itself excluded, ordered
    (distance asc, df desc, term asc). Returns DataFrame[(term, df,
    dist)].

    Scale shape: one filtered dictionary scan — a length-band prune
    (|len(term) - len(q)| <= max_dist) cuts the scan before the JVM-side
    levenshtein, then TakeOrdered(k). Same plan as fuzzy expansion."""
    t = term.lower()
    ts = index.term_stats.filter(F.col("stream") == "body")
    ts = ts.filter(
        (F.length("term") >= len(t) - max_dist)
        & (F.length("term") <= len(t) + max_dist)
        & (F.col("term") != t)
    )
    d = F.levenshtein(F.col("term"), F.lit(t))
    return (
        ts.select("term", "df", d.alias("dist"))
        .filter(F.col("dist") <= max_dist)
        .orderBy(F.asc("dist"), F.desc("df"), F.asc("term"))
        .limit(k)
    )


def suggest(index, prefix: str, k: int = 10):
    """Typeahead / query completion: the top-``k`` dictionary terms with
    the given prefix, most frequent first (df desc, term asc) — the
    Lucene/ES term-suggester shape. One filtered dictionary scan with a
    pushdown-friendly StartsWith predicate + TakeOrdered(k); at 10^9-term
    scale a prefix-ordered dictionary projection makes this a range scan."""
    return (
        index.term_stats.filter(
            (F.col("stream") == "body") & F.col("term").startswith(prefix)
        )
        .select("term", "df")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(k)
    )
