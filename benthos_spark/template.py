"""Config templates: user-defined components expanded at config time.

Reference: internal/template/{config.go,template.go} and the template
files under template/ — a template declares a component `name`/`type`,
typed `fields` (with defaults), and a Bloblang `mapping` that maps the
user-supplied field values (`this`) to the concrete component config
(`root`).  A config that names the template where a component of that
type is expected gets the expansion spliced in, then compiles as
normal (template.go ExpandToNode).

Here the mapping is evaluated through the SAME Bloblang→Column
compiler the data path uses, applied to a one-row DataFrame of the
field values and collected back to a config dict — template expansion
is a config-time driver step, so the one-row job cost is irrelevant,
and every Bloblang feature the engine supports works in templates too.
Heterogeneous processor arrays (mixed struct shapes in one list
literal) are the one reference pattern Spark's type system can't
express — split such templates into one branch per shape.

Template `tests:` (config → expected expansion) run via
run_template_tests, mirroring internal/template/config.go TestConfig.
"""

from __future__ import annotations

from typing import Any

import yaml

from pyspark.sql import SparkSession


class TemplateError(ValueError):
    pass


_COERCE = {
    "string": str,
    "int": int,
    "float": float,
    "bool": bool,
}


class Template:
    def __init__(self, conf: dict):
        try:
            self.name = str(conf["name"])
            self.type = str(conf["type"])
            self.mapping = str(conf["mapping"])
        except KeyError as e:
            raise TemplateError(f"template missing required key {e}") from e
        if self.type not in ("input", "processor", "output", "cache"):
            raise TemplateError(
                f"template {self.name!r}: type {self.type!r} not one of "
                "input|processor|output|cache")
        self.fields = list(conf.get("fields") or [])
        self.tests = list(conf.get("tests") or [])

    def field_values(self, params: dict | None) -> dict:
        """Merge user params over field defaults; required fields
        (no default) must be present; unknown params are a lint error
        like the reference's strict config parse."""
        params = dict(params or {})
        known = {str(f["name"]) for f in self.fields}
        unknown = set(params) - known
        if unknown:
            raise TemplateError(
                f"template {self.name!r}: unknown fields {sorted(unknown)}")
        vals: dict[str, Any] = {}
        for f in self.fields:
            fname = str(f["name"])
            if fname in params:
                v = params[fname]
            elif "default" in f:
                v = f["default"]
            else:
                raise TemplateError(
                    f"template {self.name!r}: field {fname!r} is required")
            ftype = f.get("type")
            if (v is not None and ftype in _COERCE
                    and f.get("kind", "scalar") == "scalar"):
                v = _COERCE[ftype](v)
            vals[fname] = v
        return vals

    def expand(self, spark: SparkSession, params: dict | None) -> dict:
        """Apply the template mapping to the field values → the
        concrete component config subtree (ExpandToNode analogue)."""
        from benthos_spark.bloblang import map_text
        vals = self.field_values(params)
        from benthos_spark.operators.literals import dict_literal_frame
        row = vals or {"__no_fields": True}
        row_df = dict_literal_frame(spark, row)
        if row_df is None:  # None/nested field values → inference path
            row_df = spark.createDataFrame([row])
        out = map_text(row_df, self.mapping).collect()
        if len(out) != 1:
            raise TemplateError(
                f"template {self.name!r}: mapping deleted the config row")
        conf = _plain(out[0].asDict(recursive=True))
        if not isinstance(conf, dict):
            raise TemplateError(
                f"template {self.name!r}: mapping must build an object")
        return conf


def _plain(v: Any) -> Any:
    """Row/struct collect output → plain YAML-shaped values, dropping
    None-valued keys (unassigned struct branches)."""
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items() if x is not None}
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    return v


# ---------------------------------------------------------------- registry

_TEMPLATES: dict[tuple[str, str], Template] = {}


def register_template(conf: dict | str) -> Template:
    """Register a template from a config dict, YAML text, or a path to
    a template file (InitTemplates, internal/template/template.go)."""
    if isinstance(conf, str):
        if "\n" not in conf and conf.endswith((".yaml", ".yml")):
            with open(conf) as fh:
                conf = yaml.safe_load(fh)
        else:
            conf = yaml.safe_load(conf)
    t = Template(conf)
    _TEMPLATES[(t.type, t.name)] = t
    return t


def lookup_template(section: str, name: str) -> Template | None:
    return _TEMPLATES.get((section, name))


def run_template_tests(spark: SparkSession, t: Template) -> list[str]:
    """Run the template's embedded `tests:` (config → expected
    expansion); returns failure descriptions, empty = all green."""
    failures = []
    for case in t.tests:
        name = case.get("name", "?")
        try:
            got = t.expand(spark, case.get("config") or {})
        except TemplateError as e:
            failures.append(f"{name}: expansion error: {e}")
            continue
        want = case.get("expected")
        if want is not None and got != want:
            failures.append(f"{name}: expanded {got!r} != expected {want!r}")
    return failures
