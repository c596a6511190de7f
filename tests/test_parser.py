"""Parser unit tests — modeled on the reference's QueryParserTest goldens
(/root/reference/src/Plan/test/QueryParserTest.cpp:51-141)."""

import pytest

from bitfunnel_spark.plans.ast import fmt
from bitfunnel_spark.plans.parser import QueryParseError, parse_query
from bitfunnel_spark.plans.planner import QueryPlanError, plan_query


@pytest.mark.parametrize(
    "query,expected",
    [
        ("wat", "wat"),
        ("WAT", "wat"),
        ("path:wat", "path:wat"),
        ("wat foo", "And(wat, foo)"),
        ("wat & foo", "And(wat, foo)"),
        ("wat|foo", "Or(wat, foo)"),
        ("wat -foo", "And(wat, Not(foo))"),
        ("-foo wat", "And(Not(foo), wat)"),
        ("(a|b) c", "And(Or(a, b), c)"),
        ("a | b c", "Or(a, And(b, c))"),
        ('"big cat"', '"big cat"'),
        ('path:"big cat"', 'path:"big cat"'),
        ('"one"', "one"),
        ("a (b | (c d)) -e", "And(a, Or(b, And(c, d)), Not(e))"),
        (r"wa\&t", "wa&t"),
        ("  spaced   out  ", "And(spaced, out)"),
    ],
)
def test_parse(query, expected):
    assert fmt(parse_query(query)) == expected


@pytest.mark.parametrize("bad", ["", "(", "a |", "a)", '"unterminated', "-", "a & ", "badstream:x"])
def test_parse_errors(bad):
    with pytest.raises(QueryParseError):
        parse_query(bad)


def test_double_negation_normalizes():
    assert fmt(plan_query(parse_query("--a")).ast) == "a"


@pytest.mark.parametrize("q", ["-a", "a | -b", "-a -b"])
def test_pure_not_rejected(q):
    with pytest.raises(QueryPlanError):
        plan_query(parse_query(q))


def test_plan_terms_and_scoring():
    plan = plan_query(parse_query('lang:py "data join" -slow'))
    assert plan.terms == {("lang", "py"), ("body", "data"), ("body", "join"), ("body", "slow")}
    assert plan.scoring_terms == {"data", "join"}
    assert len(plan.phrases) == 1 and plan.phrases[0][1] is False
