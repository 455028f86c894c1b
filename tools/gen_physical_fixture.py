#!/usr/bin/env python3
"""Regenerates src/test/resources/reference_physical_fixture.json by
EXECUTING the reference's physical-profile index ops
(graflo/architecture/evolution/physical.py:132-278 via apply_evolution)
over (manifest, ops) corner cases — ground truth for
ReferencePhysicalParitySpec.

The comparison plane is the DatabaseProfile's index surface:

  vertex_indexes: {vertex: [{fields, unique}, ...]}   (derived-from-
                  secondary entries included, registration order)
  edge_indexes:   [{source, target, relation, indexes: [...]}] per
                  physical spec

`error` is non-null when the reference itself rejects the op sequence.

Usage:
  PYTHONPATH=/tmp/refstubs:/root/reference python3 tools/gen_physical_fixture.py \
      > src/test/resources/reference_physical_fixture.json
"""
import sys, json

sys.path.insert(0, '/tmp/refstubs'); sys.path.insert(0, '/root/reference')
import yaml
from pydantic import TypeAdapter
from graflo.architecture.contract.manifest import GraphManifest
from graflo.architecture.evolution import apply_evolution
from graflo.architecture.evolution.ops import ManifestOp

CASES = []


def case(name, ops, manifest_yaml=None):
    CASES.append({"name": name, "manifest": manifest_yaml or BASE, "ops": ops})


BASE = """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid, age, email]
                identity: [pid]
                secondary_identities:
                -   {name: by_email, fields: [email]}
            -   name: city
                properties: [cid, pop]
                identity: [cid]
        edge_config:
            edges:
            -   source: person
                target: city
                relation: lives_in
                properties: [since, w]
            -   source: person
                target: city
                relation: works_near
    db_profile:
        vertex_indexes:
            person:
            -   {fields: [age], unique: false}
        edge_specs:
        -   source: person
            target: city
            relation: lives_in
            indexes:
            -   fields: [since]
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: person
"""

case("avi_basic", [
    {"op": "add_vertex_indexes", "indexes": {"city": [{"fields": ["pop"]}]}}])
case("avi_nonunique_composite", [
    {"op": "add_vertex_indexes",
     "indexes": {"person": [{"fields": ["age", "email"], "unique": False}]}}])
case("avi_dedup_derived", [
    {"op": "add_vertex_indexes", "indexes": {"person": [{"fields": ["email"]}]}}])
case("avi_dedup_authored", [
    {"op": "add_vertex_indexes", "indexes": {"person": [{"fields": ["age"]}]}},
    {"op": "add_vertex_indexes", "indexes": {"person": [{"fields": ["age"]}]}}])
case("avi_unknown_vertex", [
    {"op": "add_vertex_indexes", "indexes": {"ghost": [{"fields": ["x"]}]}}])
case("avi_undeclared_field", [
    {"op": "add_vertex_indexes", "indexes": {"city": [{"fields": ["altitude"]}]}}])

case("rvi_basic", [
    {"op": "remove_vertex_indexes", "indexes": {"person": [["age"]]}}])
case("rvi_derived_refused", [
    {"op": "remove_vertex_indexes", "indexes": {"person": [["email"]]}}])
case("rvi_unmatched", [
    {"op": "remove_vertex_indexes", "indexes": {"city": [["pop"]]}}])
case("rvi_unknown_vertex", [
    {"op": "remove_vertex_indexes", "indexes": {"ghost": [["x"]]}}])

case("aei_basic", [
    {"op": "add_edge_indexes", "edges": [
        {"source": "person", "target": "city", "relation": "lives_in",
         "indexes": [{"fields": ["w"], "unique": False}]}]}])
case("aei_duplicate", [
    {"op": "add_edge_indexes", "edges": [
        {"source": "person", "target": "city", "relation": "lives_in",
         "indexes": [{"fields": ["since"]}]}]}])
case("aei_unknown_edge", [
    {"op": "add_edge_indexes", "edges": [
        {"source": "city", "target": "person", "relation": "ghost_rel",
         "indexes": [{"fields": ["w"]}]}]}])
case("aei_no_spec", [
    {"op": "add_edge_indexes", "edges": [
        {"source": "person", "target": "city", "relation": "works_near",
         "indexes": [{"fields": ["w"]}]}]}])
case("aei_empty", [
    {"op": "add_edge_indexes", "edges": [
        {"source": "person", "target": "city", "relation": "lives_in"}]}])

case("rei_basic", [
    {"op": "remove_edge_indexes", "edges": [
        {"source": "person", "target": "city", "relation": "lives_in",
         "fields": [["since"]]}]}])
case("rei_unmatched", [
    {"op": "remove_edge_indexes", "edges": [
        {"source": "person", "target": "city", "relation": "lives_in",
         "fields": [["w"]]}]}])
case("rei_no_fields", [
    {"op": "remove_edge_indexes", "edges": [
        {"source": "person", "target": "city", "relation": "lives_in"}]}])

case("chain_roundtrip", [
    {"op": "add_vertex_indexes", "indexes": {"city": [{"fields": ["pop"]}]}},
    {"op": "add_edge_indexes", "edges": [
        {"source": "person", "target": "city", "relation": "lives_in",
         "indexes": [{"fields": ["w"]}]}]},
    {"op": "remove_vertex_indexes", "indexes": {"city": [["pop"]]}},
    {"op": "remove_edge_indexes", "edges": [
        {"source": "person", "target": "city", "relation": "lives_in",
         "fields": [["w"], ["since"]]}]}])


# renames/removals must carry the index surface with them
# (apply_field_rename_to_db_profile / apply.py:673-696)
case("idx_follows_vertex_rename", [
    {"op": "rename_vertex_properties", "renames": {"person": {"age": "years"}}}])
case("idx_prunes_vertex_removal", [
    {"op": "add_vertex_indexes",
     "indexes": {"person": [{"fields": ["age", "email"], "unique": False}]}},
    {"op": "remove_vertex_properties", "removals": {"person": ["age"]}}])
case("idx_follows_edge_prop_rename", [
    {"op": "rename_edge_properties", "renames": {"lives_in": {"since": "start"}}}])
case("idx_prunes_edge_prop_removal", [
    {"op": "remove_edge_properties", "removals": {"lives_in": ["since"]}}])

# an edge-spec index referencing an ENDPOINT vertex field prunes when
# that vertex property is removed (apply.py:684-696 edge_spec loop —
# source AND target vertex removal sets)
EDGE_ENDPOINT_IX = BASE.replace("""            indexes:
            -   fields: [since]
""", """            indexes:
            -   fields: [since, age]
            -   fields: [age]
""")
case("idx_prunes_edge_spec_on_endpoint_removal",
     [{"op": "remove_vertex_properties", "removals": {"person": ["age"]}}],
     manifest_yaml=EDGE_ENDPOINT_IX)

# removing a secondary identity drops its DERIVED lookup index from the
# profile (identity.py:533-540 — any index whose field SET matches)
case("rsi_prunes_derived_index", [
    {"op": "remove_secondary_identities", "removals": {"person": ["by_email"]}}])
# ...including an authored index that happens to share the field set
AUTHORED_DUP = BASE.replace("""        vertex_indexes:
            person:
            -   {fields: [age], unique: false}
""", """        vertex_indexes:
            person:
            -   {fields: [age], unique: false}
            -   {fields: [email], unique: false}
""")
case("rsi_prunes_authored_duplicate", [
    {"op": "remove_secondary_identities", "removals": {"person": ["by_email"]}}],
    manifest_yaml=AUTHORED_DUP)


case("cft_vertex_ok", [
    {"op": "change_field_types", "vertices": {
        "person": {"age": {"type": "INT"}},
        "city": {"pop": {"type": "LIST", "item_type": "INT"}}}}])
case("cft_edge_ok", [
    {"op": "change_field_types", "vertices": {},
     "edges": {"lives_in": {"w": {"type": "DOUBLE"}}}}])
case("cft_unknown_vertex", [
    {"op": "change_field_types", "vertices": {"ghost": {"x": {"type": "INT"}}}}])
case("cft_undeclared_field", [
    {"op": "change_field_types", "vertices": {"city": {"altitude": {"type": "INT"}}}}])
case("cft_list_identity_rejected", [
    {"op": "change_field_types", "vertices": {
        "person": {"pid": {"type": "LIST", "item_type": "STRING"}}}}])
case("cft_unknown_relation", [
    {"op": "change_field_types", "vertices": {},
     "edges": {"ghost_rel": {"w": {"type": "INT"}}}}])
case("cft_undeclared_edge_field", [
    {"op": "change_field_types", "vertices": {},
     "edges": {"lives_in": {"nope": {"type": "INT"}}}}])


def _ft(field):
    t = getattr(field, "type", None)
    it = getattr(field, "item_type", None)
    if t is None:
        return None
    return str(t) + (f"<{it}>" if it is not None else "")


def proj(m):
    p = m.graph_schema.db_profile
    core = m.graph_schema.core_schema
    field_types = {
        v.name: {f.name: _ft(f) for f in v.properties if _ft(f) is not None}
        for v in core.vertex_config.vertices}
    edge_field_types = {
        str(e.relation): {f.name: _ft(f) for f in e.properties if _ft(f) is not None}
        for e in core.edge_config.edges if e.properties}
    return {
        "field_types": {k: v for k, v in field_types.items() if v},
        "edge_field_types": {k: v for k, v in edge_field_types.items() if v},
        "vertex_indexes": {
            k: [{"fields": list(i.fields), "unique": bool(i.unique)} for i in v]
            for k, v in p.vertex_indexes.items() if v},
        "edge_indexes": [
            {"source": s.source, "target": s.target, "relation": s.relation,
             "indexes": [{"fields": list(i.fields), "unique": bool(i.unique)}
                         for i in s.indexes]}
            for s in p.edge_specs],
    }


def dumps(x):
    return json.dumps(x, sort_keys=True, separators=(",", ":"), default=str)


def run_case(c):
    m = GraphManifest.from_config(yaml.safe_load(c["manifest"]))
    m.finish_init()
    before = dumps(proj(m))
    error = None
    after = None
    try:
        ops = TypeAdapter(list[ManifestOp]).validate_python(c["ops"])
        out = apply_evolution(m, ops)
        after = dumps(proj(out))
    except Exception as e:
        error = f"{type(e).__name__}: {e}"
    return {"name": c["name"], "manifest": c["manifest"], "ops": c["ops"],
            "before": before, "after": after, "error": error}


def main():
    print(json.dumps([run_case(c) for c in CASES], indent=1, default=str))


if __name__ == "__main__":
    main()
