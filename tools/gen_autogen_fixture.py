#!/usr/bin/env python3
"""Regenerates src/test/resources/reference_autogen_fixture.json by
EXECUTING the reference's evolution AUTOGENERATE plane
(`diff_manifests`, graflo/architecture/evolution/autogenerate.py) over
(base, target) manifest pairs — ground truth for
ReferenceAutogenParitySpec.

Recorded per case: the derived op list (model_dump dicts, in the
reference's precondition order) plus its warnings. The spec compares the
CHANGE SET as a normalized atom multiset (add/remove vertex, add/remove
property, replace identity, add/remove edge, ...) against graft's
`Evolution.diff` — op ordering differs by design (the reference stages
renames→adds→props→identity→removals; graft's conservative diff has no
rename hints), the derived CONTENT must match.

Usage:
  PYTHONPATH=/tmp/refstubs:/root/reference python3 tools/gen_autogen_fixture.py \
      > src/test/resources/reference_autogen_fixture.json
"""
import sys, json

sys.path.insert(0, '/tmp/refstubs'); sys.path.insert(0, '/root/reference')
import yaml
from graflo.architecture.contract.manifest import GraphManifest
from graflo.architecture.evolution.autogenerate import diff_manifests

CASES = []


def case(name, base_yaml, target_yaml):
    CASES.append({"name": name, "base": base_yaml, "target": target_yaml})


def man(vertices, edges):
    return yaml.safe_dump({
        "schema": {"metadata": {"name": "t"},
                   "graph": {"vertex_config": {"vertices": vertices},
                             "edge_config": {"edges": edges}}},
        "ingestion_model": {"resources": [
            {"name": "r", "pipeline": [{"vertex": vertices[0]["name"]}]}]},
    }, sort_keys=False)


P = {"name": "person",
     "properties": [{"name": "pid", "type": "STRING"}, {"name": "pname"}],
     "identity": ["pid"]}
C = {"name": "city", "properties": ["cid", "pop"], "identity": ["cid"]}
K = {"name": "company", "properties": ["coid"], "identity": ["coid"]}
E_PC = {"source": "person", "target": "city", "relation": "lives_in"}
E_PK = {"source": "person", "target": "company", "relation": "works_at"}

case("additive_vertex_and_edge",
     man([P, C], [E_PC]),
     man([P, C, K], [E_PC, E_PK]))

case("destructive_vertex_cascades_edge",
     man([P, C, K], [E_PC, E_PK]),
     man([P, C], [E_PC]))

case("property_add_remove",
     man([P, C], [E_PC]),
     man([{**P, "properties": [{"name": "pid", "type": "STRING"},
                               {"name": "email"}]},
          {**C, "properties": ["cid", "pop", "mayor"]}], [E_PC]))

case("identity_change_natural",
     man([P, C], [E_PC]),
     man([{**P, "identity": ["pname"]}, C], [E_PC]))

case("identity_change_to_hash",
     man([P, C], [E_PC]),
     man([{"name": "person",
           "properties": [{"name": "pid", "type": "STRING"},
                          {"name": "pname"}],
           "hash_identity_properties": ["pid", "pname"]}, C], [E_PC]))

case("edge_property_add_remove",
     man([P, C], [{**E_PC, "properties": ["since"]}]),
     man([P, C], [{**E_PC, "properties": ["weight"]}]))

case("type_change_only",
     man([P, C], [E_PC]),
     man([{"name": "person",
           "properties": [{"name": "pid", "type": "STRING"},
                          {"name": "pname", "type": "STRING"}],
           "identity": ["pid"]}, C], [E_PC]))

case("secondary_identity_add",
     man([P, C], [E_PC]),
     man([{**P, "secondary_identities": [{"name": "by_name",
                                          "fields": ["pname"]}]}, C], [E_PC]))

case("relation_swap_without_hints",
     man([P, C], [E_PC]),
     man([P, C], [{"source": "person", "target": "city",
                   "relation": "resides_in"}]))

case("no_change",
     man([P, C], [E_PC]),
     man([P, C], [E_PC]))


def run_case(c):
    base = GraphManifest.from_config(yaml.safe_load(c["base"]))
    base.finish_init()
    target = GraphManifest.from_config(yaml.safe_load(c["target"]))
    target.finish_init()
    error = None
    ops = None
    warnings = None
    try:
        derived, warns = diff_manifests(base, target)
        ops = [o.model_dump(exclude_none=True, by_alias=True) for o in derived]
        warnings = list(warns)
    except Exception as e:
        error = f"{type(e).__name__}: {e}"
    return {"name": c["name"], "base": c["base"], "target": c["target"],
            "ops": ops, "warnings": warnings, "error": error}


def main():
    print(json.dumps([run_case(c) for c in CASES], indent=1, default=str))


if __name__ == "__main__":
    main()
