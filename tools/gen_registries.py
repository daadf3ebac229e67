#!/usr/bin/env python3
"""Generate Scala schema registries from the reference's declarative
dictionaries (pure data: column->type maps and Cerberus rule schemas).

Parses with `ast` (no reference code is executed or copied — only the
literal data tables are transcribed), emits:
  src/main/scala/graft/schema/Registries.scala
  src/main/scala/graft/schema/ValidationSchemas.scala
"""
import ast
import sys

REF = "/root/reference/src/les_etl_pipeline"


def parse_type_map(tree, name):
    """Find `NAME = { "col": XType(), ... }` (as assign or dict value)."""
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            tgt = node.targets[0]
            key = None
            if isinstance(tgt, ast.Name) and tgt.id == name:
                key = node.value
            elif (isinstance(tgt, ast.Subscript)
                  and isinstance(tgt.slice, ast.Constant)
                  and tgt.slice.value == name):
                key = node.value
            if key is not None and isinstance(key, ast.Dict):
                out = []
                for k, v in zip(key.keys, key.values):
                    out.append((k.value, v.func.id))
                return out
    raise KeyError(name)


TYPE_MAP = {"StringType": "DString", "BooleanType": "DBool",
            "DateType": "DDate", "DoubleType": "DDouble",
            "IntegerType": "DInt"}


def dt_str(node):
    """datetime.datetime(y, m, d, ...) -> 'yyyy-MM-dd'."""
    args = [a.value for a in node.args]
    return f"{args[0]:04d}-{args[1]:02d}-{args[2]:02d}"


def parse_rule(d):
    """One Cerberus column dict -> rule fields."""
    r = {"typ": None, "nullable": False, "coerce": False, "allowed": None,
         "min": None, "max": None, "label": ""}
    for k, v in zip(d.keys, d.values):
        key = k.value
        if key == "type":
            r["typ"] = v.value
        elif key == "nullable":
            r["nullable"] = bool(v.value)
        elif key == "coerce":
            r["coerce"] = True  # TO_NUMBER or TO_DATE by typ
        elif key == "allowed":
            r["allowed"] = [str(e.value) for e in v.elts]
        elif key in ("min", "max"):
            if isinstance(v, ast.Call):
                r[key] = dt_str(v)
            elif isinstance(v, ast.Name):
                r[key] = {"MIN_DATETIME": "2012-01-01",
                          "MAX_DATETIME": "2100-12-31"}[v.id]
        elif key == "meta":
            for mk, mv in zip(v.keys, v.values):
                if mk.value == "label":
                    r["label"] = mv.value
    return r


def parse_schema_fn(tree, fn_name):
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == fn_name:
            for sub in ast.walk(node):
                if isinstance(sub, ast.Dict) and sub.keys and \
                        isinstance(sub.keys[0], ast.Constant):
                    # the big literal merged with COMMON_SCHEMA
                    return {k.value: parse_rule(v)
                            for k, v in zip(sub.keys, sub.values)
                            if isinstance(v, ast.Dict)}
    raise KeyError(fn_name)


def parse_common(tree):
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and \
                isinstance(node.targets[0], ast.Name) and \
                node.targets[0].id == "COMMON_SCHEMA":
            return {k.value: parse_rule(v)
                    for k, v in zip(node.value.keys, node.value.values)}
    raise KeyError("COMMON_SCHEMA")


def scala_str(s):
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def rule_scala(name, r):
    typ = {"string": "TString", "number": "TNumber",
           "datetime": "TDatetime"}[r["typ"]]
    parts = [typ]
    if r["nullable"]:
        parts.append("nullable = true")
    if r["coerce"]:
        parts.append("coerce = true")
    if r["allowed"] is not None:
        vals = ", ".join(scala_str(v) for v in r["allowed"])
        parts.append(f"allowed = Some(Seq({vals}))")
    if r["min"]:
        parts.append(f'minDate = Some("{r["min"]}")')
    if r["max"]:
        parts.append(f'maxDate = Some("{r["max"]}")')
    if r["label"]:
        parts.append(f"label = {scala_str(r['label'])}")
    return f"    {scala_str(name)} -> ColumnRule({', '.join(parts)}),"


def main():
    silver = ast.parse(open(f"{REF}/utils/silver_funcs.py").read())
    rules = ast.parse(open(f"{REF}/utils/validation_rules.py").read())
    dds = ast.parse(open(f"{REF}/generate_deal_details_silver.py").read())

    asset_cols = parse_type_map(silver, "ASSET_COLUMNS")
    bond_cols = parse_type_map(silver, "BOND_COLUMNS")
    deal_cols = parse_type_map(dds, "DEAL_DETAILS_COLUMNS")

    common = parse_common(rules)
    asset_schema = parse_schema_fn(rules, "asset_schema")
    bond_schema = parse_schema_fn(rules, "bond_info_schema")
    # the function dicts are merged over COMMON_SCHEMA in the reference
    asset_schema = {**common, **asset_schema}
    bond_schema = {**common, **bond_schema}

    def type_entries(cols):
        return "\n".join(
            f"    {scala_str(c)} -> {TYPE_MAP[t]}," for c, t in cols)

    reg = f"""package graft.schema

/** Silver column→type registries, transcribed from the reference's
  * declarative dictionaries (`silver_funcs.py:81-248`,
  * `generate_deal_details_silver.py:31-70`) by tools/gen_registries.py.
  * DO NOT EDIT BY HAND — regenerate instead.
  */
object Registries {{
  sealed trait DType
  case object DString extends DType
  case object DBool extends DType
  case object DDate extends DType
  case object DDouble extends DType
  case object DInt extends DType

  val assetColumns: Seq[(String, DType)] = Seq(
{type_entries(asset_cols)}
  )

  val bondColumns: Seq[(String, DType)] = Seq(
{type_entries(bond_cols)}
  )

  val dealDetailsColumns: Seq[(String, DType)] = Seq(
{type_entries(deal_cols)}
  )
}}
"""
    def schema_entries(sch):
        return "\n".join(rule_scala(n, r) for n, r in sch.items())

    val = f"""package graft.schema

import graft.quality.Rules._

/** Validation schemas transcribed from the reference's Cerberus
  * dictionaries (`validation_rules.py:26-1123`) by
  * tools/gen_registries.py. DO NOT EDIT BY HAND — regenerate instead.
  */
object ValidationSchemas {{
  val assetSchema: Map[String, ColumnRule] = Map(
{schema_entries(asset_schema)}
  )

  val bondInfoSchema: Map[String, ColumnRule] = Map(
{schema_entries(bond_schema)}
  )
}}
"""
    base = "/root/repo/src/main/scala/graft/schema"
    open(f"{base}/Registries.scala", "w").write(reg)
    open(f"{base}/ValidationSchemas.scala", "w").write(val)
    print(f"asset cols: {len(asset_cols)}, bond cols: {len(bond_cols)}, "
          f"deal cols: {len(deal_cols)}")
    print(f"asset rules: {len(asset_schema)}, bond rules: {len(bond_schema)}")
    nums = [n for n, r in {**asset_schema, **bond_schema}.items()
            if r["typ"] == "number" and not r["coerce"]]
    dates = [n for n, r in {**asset_schema, **bond_schema}.items()
             if r["typ"] == "datetime" and not r["coerce"]]
    print(f"number-without-coerce: {nums}\ndatetime-without-coerce: {dates}")


if __name__ == "__main__":
    main()
