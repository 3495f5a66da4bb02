"""Go text/template compiler (E7): template string -> one Column expression.

The reference's stdout sink executes a user template against
``{Timestamp time.Time, Tag string, Data map[string]any}``
(internal/output/stdout/stdout.go:153-173). This compiles the
deterministic, column-expressible subset of text/template straight to
Catalyst (one projection, no Python in the hot path):

- literal text, ``{{- ... -}}`` whitespace trim markers
- field actions: ``{{.Timestamp}}`` (Go ``time.Time.String()`` rendering),
  ``{{.Tag}}``, ``{{.Data}}`` (Go ``fmt`` map rendering: sorted keys,
  ``map[k:v ...]``), ``{{.Data.key}}`` (``<no value>`` when missing)
- ``{{if <field>}} ... {{else}} ... {{end}}`` with Go template truth over
  the map<string,string> parity view (present and non-empty; Go's numeric
  falsiness is not distinguishable once values are strings — documented)
- ``{{range .Data}} ... {{else}} ... {{end}}``: iterate the map in sorted
  key order (text/template sorts map keys of basic types); ``{{.}}`` in
  the body is the current VALUE; the else branch renders for an empty/nil
  map. Compiles to ``transform`` over sorted ``map_entries`` + a
  ``array_join`` — a higher-order Column, still zero Python.
- ``{{with <field>}} ... {{else}} ... {{end}}``: rebind the dot to the
  field when truthy (same truth rule as if), else branch otherwise.

Anything else (pipelines, functions, variables, range over non-``.Data``)
raises ``ValueError`` at build time — loud beats silently-wrong output.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

_ACTION = re.compile(r"\{\{(-?)\s*(.*?)\s*(-?)\}\}", re.S)
_FIELD = re.compile(r"^\.(\w+)(?:\.(\w+))?$")


def go_time_string(ts: Column) -> Column:
    """``time.Time.String()`` of a UTC instant: ``2006-01-02 15:04:05.999999999 -0700 MST``
    with the fractional part trailing-zero-trimmed and omitted when zero
    (session timezone is UTC, so the suffix is the fixed ``+0000 UTC``)."""
    base = F.date_format(ts, "yyyy-MM-dd HH:mm:ss")
    frac = F.regexp_replace(F.date_format(ts, "SSSSSS"), "0+$", "")
    return F.concat(
        base,
        F.when(frac != "", F.concat(F.lit("."), frac)).otherwise(F.lit("")),
        F.lit(" +0000 UTC"),
    )


def go_map_string(parsed: Column) -> Column:
    """Go ``fmt`` rendering of a map: ``map[k1:v1 k2:v2]``, keys sorted
    (text/template and fmt both sort map keys); nil map prints ``map[]``."""
    entries = F.transform(
        F.array_sort(F.map_entries(parsed)),
        lambda e: F.concat(e.getField("key"), F.lit(":"), e.getField("value")),
    )
    body = F.array_join(entries, " ")
    return F.concat(F.lit("map["), F.coalesce(body, F.lit("")), F.lit("]"))


@dataclass
class _Node:
    pass


@dataclass
class _Text(_Node):
    text: str


@dataclass
class _Field(_Node):
    root: str
    key: str | None


@dataclass
class _Dot(_Node):
    """``{{.}}`` — the rebound dot inside a range/with body."""


@dataclass
class _If(_Node):
    cond: _Field
    then: list[_Node] = field(default_factory=list)
    orelse: list[_Node] = field(default_factory=list)


@dataclass
class _Range(_Node):
    target: _Field
    then: list[_Node] = field(default_factory=list)
    orelse: list[_Node] = field(default_factory=list)


@dataclass
class _With(_Node):
    target: _Field
    then: list[_Node] = field(default_factory=list)
    orelse: list[_Node] = field(default_factory=list)


def _parse_field(expr: str, template: str) -> _Field | _Dot:
    if expr == ".":
        return _Dot()
    m = _FIELD.match(expr)
    if not m or m.group(1) not in ("Timestamp", "Tag", "Data"):
        raise ValueError(f"unsupported template expression {expr!r} in {template!r}")
    if m.group(2) and m.group(1) != "Data":
        raise ValueError(f"unsupported template expression {expr!r} in {template!r}")
    return _Field(m.group(1), m.group(2))


def _parse(template: str) -> list[_Node]:
    root: list[_Node] = []
    stack: list[_If] = []

    def emit(node: _Node) -> None:
        target = root
        if stack:
            top = stack[-1]
            target = top.orelse if getattr(top, "_in_else", False) else top.then
        target.append(node)

    pos = 0
    pending_trim = False  # previous action ended with '-}}'
    for m in _ACTION.finditer(template):
        text = template[pos : m.start()]
        if pending_trim:
            text = text.lstrip()
        if m.group(1) == "-":
            text = text.rstrip()
        if text:
            emit(_Text(text))
        action = m.group(2)
        pending_trim = m.group(3) == "-"
        pos = m.end()
        if action.startswith("if "):
            node = _If(_parse_field(action[3:].strip(), template))
            emit(node)
            stack.append(node)
        elif action.startswith("range "):
            target = _parse_field(action[6:].strip(), template)
            if not isinstance(target, _Field) or target.root != "Data" or target.key:
                raise ValueError(
                    f"range target must be .Data (the only collection) in {template!r}"
                )
            node = _Range(target)
            emit(node)
            stack.append(node)
        elif action.startswith("with "):
            target = _parse_field(action[5:].strip(), template)
            if isinstance(target, _Dot):
                raise ValueError(f"with target cannot be '.' in {template!r}")
            node = _With(target)
            emit(node)
            stack.append(node)
        elif action == "else":
            if not stack:
                raise ValueError(f"unexpected {{{{else}}}} in {template!r}")
            stack[-1]._in_else = True  # noqa: SLF001
        elif action == "end":
            if not stack:
                raise ValueError(f"unexpected {{{{end}}}} in {template!r}")
            stack.pop()
        else:
            emit(_parse_field(action, template))
    if stack:
        raise ValueError(f"unclosed {{{{if}}}} in {template!r}")
    tail = template[pos:]
    if pending_trim:
        tail = tail.lstrip()
    if tail:
        root.append(_Text(tail))
    return root


def compile_go_template(
    template: str, parsed: Column, tag: Column, event_time: Column
) -> Column:
    """Compile a Go text/template to a single string Column (see module
    docstring for the supported subset)."""

    def render_field(f: _Field) -> Column:
        # Every field coalesces to a non-null string: F.concat is
        # null-propagating, so ONE null field would blank the whole rendered
        # line, whereas Go's text/template prints an empty string for a
        # zero-value Tag and "map[]" for a nil Data map.
        if f.root == "Timestamp":
            return F.coalesce(go_time_string(event_time), F.lit(""))
        if f.root == "Tag":
            return F.coalesce(tag, F.lit(""))
        if f.key is None:
            return F.coalesce(go_map_string(parsed), F.lit("map[]"))
        return F.coalesce(parsed.getItem(f.key), F.lit("<no value>"))

    def truthy(f: _Field) -> Column:
        if f.root == "Timestamp":
            return F.lit(True)
        if f.root == "Tag":
            return tag.isNotNull() & (tag != "")
        if f.key is None:
            return F.coalesce(F.size(F.map_entries(parsed)) > 0, F.lit(False))
        item = parsed.getItem(f.key)
        return item.isNotNull() & (item != "")

    def render(nodes: list[_Node], dot: Column | None = None) -> Column:
        parts = []
        for n in nodes:
            if isinstance(n, _Text):
                parts.append(F.lit(n.text))
            elif isinstance(n, _Dot):
                if dot is None:
                    raise ValueError(
                        f"{{{{.}}}} outside a range/with body in {template!r}"
                    )
                parts.append(F.coalesce(dot, F.lit("")))
            elif isinstance(n, _Field):
                parts.append(render_field(n))
            elif isinstance(n, _Range):
                entries = F.array_sort(F.map_entries(parsed))
                body = F.array_join(
                    F.transform(
                        entries, lambda e: render(n.then, dot=e.getField("value"))
                    ),
                    "",
                )
                parts.append(
                    F.when(
                        F.coalesce(F.size(entries), F.lit(0)) > 0, body
                    ).otherwise(render(n.orelse, dot))
                )
            elif isinstance(n, _With):
                if n.target.root == "Timestamp":
                    val = go_time_string(event_time)
                elif n.target.root == "Tag":
                    val = tag
                elif n.target.key is None:
                    val = go_map_string(parsed)
                else:
                    val = parsed.getItem(n.target.key)
                parts.append(
                    F.when(truthy(n.target), render(n.then, dot=val)).otherwise(
                        render(n.orelse, dot)
                    )
                )
            else:
                parts.append(
                    F.when(truthy(n.cond), render(n.then, dot)).otherwise(
                        render(n.orelse, dot)
                    )
                )
        return F.concat(*parts) if parts else F.lit("")

    return render(_parse(template))
