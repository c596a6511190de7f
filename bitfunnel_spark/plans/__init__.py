from bitfunnel_spark.plans.ast import And, Node, Not, Or, Phrase, Term
from bitfunnel_spark.plans.parser import QueryParseError, parse_query

__all__ = ["And", "Or", "Not", "Term", "Phrase", "Node", "parse_query", "QueryParseError"]
