"""ES search templates: mustache-lite rendering + execution.

Elasticsearch stores search templates as mustache source (usually a JSON
string with ``{{var}}`` placeholders) and renders them with a params map
at query time (`POST _search/template`). This module implements the
documented subset of mustache ES itself documents for templates:

  {{var}}                      value substitution — strings render raw,
                               everything else renders as JSON (numbers
                               bare, lists/objects as JSON), mustache's
                               behavior
  {{#toJson}}var{{/toJson}}    explicit JSON-encode (ES's custom lambda)

Deviation (documented): a placeholder whose param is MISSING raises
TemplateError — mustache renders the empty string, which silently turns
`"size": {{k}}` into invalid JSON or a default the user did not ask for;
refusing to guess is this engine's house rule.

Sources can be a raw mustache string (rendered, then json.loads — the ES
storage format, able to template structure) or an already-parsed dict
(each string leaf substituted; a leaf that is EXACTLY one placeholder
takes the param's raw value, so ``"size": "{{k}}"`` yields an int).

Reference surface analogue: the reference engine's query files /
genqueries tooling (tools/BitFunnel/src/) parameterize query logs the
same way — a template plus bindings producing executable queries.
"""

from __future__ import annotations

import json
import re

from bitfunnel_spark.plans.dsl import DslError, search_dsl

_VAR_RE = re.compile(r"\{\{([A-Za-z0-9_.]+)\}\}")
_TOJSON_RE = re.compile(r"\{\{#toJson\}\}\s*([A-Za-z0-9_.]+)\s*\{\{/toJson\}\}")
# one combined scan: substituted text is NEVER rescanned, so a param VALUE
# containing "{{...}}" comes through literally instead of re-expanding
# (mustache's no-reinterpolation rule)
_ANY_RE = re.compile(f"{_TOJSON_RE.pattern}|{_VAR_RE.pattern}")


class TemplateError(DslError):
    pass


def _lookup(params: dict, name: str):
    if name not in params:
        raise TemplateError(f"missing template param: {name!r}")
    return params[name]


def _render_str(s: str, params: dict) -> str:
    def sub(m: re.Match) -> str:
        tojson_name, var_name = m.group(1), m.group(2)
        if tojson_name is not None:
            return json.dumps(_lookup(params, tojson_name))
        v = _lookup(params, var_name)
        return v if isinstance(v, str) else json.dumps(v)

    return _ANY_RE.sub(sub, s)


def render_template(source, params: dict | None = None):
    """Render a template ``source`` (mustache string or parsed dict) with
    ``params`` into an executable ES body dict."""
    params = params or {}
    if isinstance(source, str):
        rendered = _render_str(source, params)
        try:
            return json.loads(rendered)
        except json.JSONDecodeError as e:
            raise TemplateError(
                f"rendered template is not valid JSON: {e}"
            ) from e
    if isinstance(source, dict):
        return _render_node(source, params)
    raise TemplateError(f"template source must be str or dict, got {type(source)}")


def _render_node(node, params: dict):
    if isinstance(node, dict):
        return {k: _render_node(v, params) for k, v in node.items()}
    if isinstance(node, list):
        return [_render_node(v, params) for v in node]
    if isinstance(node, str):
        m = _VAR_RE.fullmatch(node)
        if m:  # whole-leaf placeholder: take the raw value (typed)
            return _lookup(params, m.group(1))
        m = _TOJSON_RE.fullmatch(node)
        if m:
            return _lookup(params, m.group(1))
        return _render_str(node, params)
    return node


def search_template(index, body: dict, k: int = 10):
    """`_search/template` analogue: ``{"source": ..., "params": {...}}`` →
    render, then run through search_dsl. The rendered body is a plain ES
    body, so every query kind / size / sort / _source the DSL supports
    composes with templating for free."""
    if not isinstance(body, dict) or "source" not in body:
        raise TemplateError("search_template body needs a `source`")
    unknown = set(body) - {"source", "params"}
    if unknown:
        raise TemplateError(f"unsupported search_template keys: {sorted(unknown)}")
    rendered = render_template(body["source"], body.get("params"))
    return search_dsl(index, rendered, k=k)
