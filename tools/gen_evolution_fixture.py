#!/usr/bin/env python3
"""Regenerates src/test/resources/reference_evolution_fixture.json by
EXECUTING the reference's schema-evolution runtime (`apply_evolution`,
graflo/architecture/evolution/apply.py) over (manifest, ops) corner cases
— ground truth for ReferenceEvolutionParitySpec.

The comparison plane is the SCHEMA block of the evolved manifest (graft's
evolution ops are schema-plane by design; the reference's ingestion-model
cascades are the documented manifest-plane difference). Per case we record
the normalized post-evolution vertex/edge config:

  vertices: name, ordered properties [(name, type?)], identity mode+fields
            (natural fields / blank / assigned / hash sources / funnel
            branches), secondary identities [(name, fields)]
  edges:    source, target, relation, directed, identities, properties

`error` is non-null when the reference itself rejects the op sequence
(executed truth — both engines owe the rejection unless noted).

Usage:
  PYTHONPATH=/tmp/refstubs:/root/reference python3 tools/gen_evolution_fixture.py \
      > src/test/resources/reference_evolution_fixture.json

(see tools/refstubs_setup.sh for /tmp/refstubs)
"""
import sys, json

sys.path.insert(0, '/tmp/refstubs'); sys.path.insert(0, '/root/reference')
import yaml
from pydantic import TypeAdapter
from graflo.architecture.contract.manifest import GraphManifest
from graflo.architecture.evolution import apply_evolution
from graflo.architecture.evolution.ops import ManifestOp

CASES = []


def case(name, manifest_yaml, ops):
    CASES.append({"name": name, "manifest": manifest_yaml, "ops": ops})


BASE = """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties:
                -   {name: pid, type: STRING}
                -   {name: pname, type: STRING}
                -   {name: age, type: INT}
                identity: [pid]
            -   name: city
                properties: [cid, pop]
                identity: [cid]
            -   name: company
                properties:
                -   {name: coid, type: STRING}
                -   {name: cname, type: STRING}
                identity: [coid]
        edge_config:
            edges:
            -   source: person
                target: city
                relation: lives_in
            -   source: person
                target: company
                relation: works_at
            -   source: company
                target: city
                relation: based_in
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: person
"""

# -------------------------------------------------------------- vertices

case("rename_vertex_cascades_edges", BASE, [
    {"op": "rename_vertices", "vertices": {"person": "human"}},
])

case("remove_vertex_drops_incident_edges", BASE, [
    {"op": "remove_vertices", "names": ["company"]},
])

# 1.10.5 rename-validation guards (changelog "Renames never checked that
# their sources existed" / "A rename could silently merge two vertex
# types"): executed truth for graft's Evolution to mirror
case("rename_unknown_source_rejected", BASE, [
    {"op": "rename_vertices", "vertices": {"ghost": "ghost2"}},
])
case("rename_onto_staying_type_rejected", BASE, [
    {"op": "rename_vertices", "vertices": {"person": "city"}},
])
case("rename_noninjective_rejected", BASE, [
    {"op": "rename_vertices", "vertices": {"person": "x", "city": "x"}},
])
case("rename_relation_unknown_source_rejected", BASE, [
    {"op": "rename_relations", "relations": {"ghost_rel": "other"}},
])
# a swap through a chain is NOT a collision if applied as one map — probe
# the executed truth rather than guessing
case("rename_vertex_swap", BASE, [
    {"op": "rename_vertices", "vertices": {"city": "company", "company": "city"}},
])

# merge into an EXISTING vertex: property union (typed beats untyped),
# edges retargeted; person->person edges would self-relate so merge the
# city/company pair instead
case("merge_vertices_into_existing", BASE, [
    {"op": "merge_vertices", "sources": ["company"], "into": "city",
     "allow_self_relations": True},
])

# merging away an endpoint WITHOUT the self-relation waiver must fail
case("merge_vertices_needs_waiver", BASE, [
    {"op": "merge_vertices", "sources": ["company"], "into": "city"},
])

case("merge_vertices_into_new", BASE, [
    {"op": "merge_vertices", "sources": ["city", "company"], "into": "org",
     "allow_self_relations": True},
])

# merging the two endpoints of works_at without the waiver must FAIL
case("merge_vertices_self_relation_rejected", BASE, [
    {"op": "merge_vertices", "sources": ["company"], "into": "person"},
])

# ------------------------------------------------------------ properties

# identity fields rename together with the property
case("rename_property_updates_identity", BASE, [
    {"op": "rename_vertex_properties",
     "renames": {"person": {"pid": "person_id", "age": "years"}}},
])

case("remove_and_add_properties", BASE, [
    {"op": "remove_vertex_properties", "removals": {"person": ["age"]}},
    {"op": "add_vertex_properties", "additions": {"city": ["mayor"]}},
])

# removing an IDENTITY field must fail on both engines
case("remove_identity_property_rejected", BASE, [
    {"op": "remove_vertex_properties", "removals": {"person": ["pid"]}},
])

# -------------------------------------------------------------- identity

# natural -> natural on other fields; default retire=demote turns the old
# identity into a `retired_identity` secondary
case("replace_identity_demotes_old", BASE, [
    {"op": "replace_identity", "vertices": {
        "person": {"to": {"mode": "natural", "identity": ["pname"]}}}},
])

case("replace_identity_keep", BASE, [
    {"op": "replace_identity", "vertices": {
        "person": {"to": {"mode": "natural", "identity": ["pname"]},
                   "retire": "keep"}}},
])

case("replace_identity_drop", BASE, [
    {"op": "replace_identity", "vertices": {
        "person": {"to": {"mode": "natural", "identity": ["pname"]},
                   "retire": "drop"}}},
])

case("replace_identity_to_hash", BASE, [
    {"op": "replace_identity", "vertices": {
        "person": {"to": {"mode": "hash", "hash_from": ["pname", "age"]}}}},
])

case("replace_identity_to_blank", BASE, [
    {"op": "replace_identity", "vertices": {
        "city": {"to": {"mode": "blank"}, "retire": "keep"}}},
])

case("replace_identity_retire_as", BASE, [
    {"op": "replace_identity", "vertices": {
        "person": {"to": {"mode": "natural", "identity": ["pname"]},
                   "retire": "demote", "retire_as": "legacy_pid"}}},
])

# ----------------------------------------------------- secondary identity

case("secondary_identities_add_remove", BASE, [
    {"op": "add_secondary_identities", "additions": {
        "person": [{"name": "by_name", "fields": ["pname"]},
                   {"name": "by_name_age", "fields": ["pname", "age"]}]}},
    {"op": "remove_secondary_identities", "removals": {
        "person": ["by_name"]}},
])

# ----------------------------------------------------------------- edges

# renaming one relation onto another between the SAME endpoints merges
# the two edge declarations
# non-colliding rename succeeds; renaming ONTO an existing relation
# between the same endpoints is REJECTED by the reference's manifest
# validation (duplicate edge definitions) — merge_edges is the merge path
case("rename_relations_collision", """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: a
                properties: [x]
                identity: [x]
            -   name: b
                properties: [y]
                identity: [y]
        edge_config:
            edges:
            -   source: a
                target: b
                relation: r1
            -   source: a
                target: b
                relation: r2
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: a
""", [
    {"op": "rename_relations", "relations": {"r1": "r2"}},
])

# retargeting onto an existing (source, target, relation) triple: probe
case("retarget_collision", """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: a
                properties: [x]
                identity: [x]
            -   name: b
                properties: [y]
                identity: [y]
            -   name: c
                properties: [z]
                identity: [z]
        edge_config:
            edges:
            -   source: a
                target: b
                relation: r1
            -   source: a
                target: c
                relation: r1
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: a
""", [
    {"op": "retarget_edges", "edges": [
        {"source": "a", "target": "b", "relation": "r1",
         "new_source": "a", "new_target": "c"}]},
])

case("rename_relations", """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: a
                properties: [x]
                identity: [x]
            -   name: b
                properties: [y]
                identity: [y]
        edge_config:
            edges:
            -   source: a
                target: b
                relation: r1
            -   source: a
                target: b
                relation: r2
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: a
""", [
    {"op": "rename_relations", "relations": {"r1": "r3"}},
])

case("merge_edges", """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: a
                properties: [x]
                identity: [x]
            -   name: b
                properties: [y]
                identity: [y]
        edge_config:
            edges:
            -   source: a
                target: b
                relation: cites
            -   source: a
                target: b
                relation: mentions
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: a
""", [
    {"op": "merge_edges", "sources": ["cites", "mentions"], "into": "refs"},
])

case("remove_edges_by_relation", BASE, [
    {"op": "remove_edges", "relations": ["works_at"]},
])

case("add_inverse_edges", BASE, [
    {"op": "add_inverse_edges", "relations": {"lives_in": "hosts"}},
])

case("edge_property_ops", BASE, [
    {"op": "add_edge_properties", "additions": {"lives_in": ["since"]}},
    {"op": "rename_edge_properties",
     "renames": {"lives_in": {"since": "from_year"}}},
])

# a NON-default uniqueness key (endpoints + a weight field): the
# non-endpoint token materializes as an edge property
case("replace_edge_identities", BASE, [
    {"op": "replace_edge_identities", "edges": [
        {"source": "person", "target": "city", "relation": "lives_in",
         "identities": [["source", "target", "share"]]}]},
])

case("retarget_edges", BASE, [
    {"op": "retarget_edges", "edges": [
        {"source": "person", "target": "company", "relation": "works_at",
         "new_source": "person", "new_target": "city"}]},
])

# ----------------------------------------------------------------- runner


def norm_schema(manifest):
    d = manifest.model_dump(by_alias=True, exclude_none=True)
    g = d["schema"]["core_schema"]
    vs = []
    for v in sorted(g["vertex_config"]["vertices"], key=lambda x: x["name"]):
        funnel = v.get("identity_funnel")
        vs.append({
            "name": v["name"],
            "properties": [
                {"name": p["name"], **({"type": str(p["type"])} if p.get("type") else {})}
                for p in v.get("properties", [])],
            "identity": v.get("identity") or [],
            "blank": bool(v.get("blank")),
            "assigned": bool(v.get("assigned")),
            "hash_from": v.get("hash_identity_properties") or [],
            "funnel_branches": ([
                {"id": b.get("id"), "fields": b.get("fields"),
                 "when_all_present": b.get("when_all_present")}
                for b in funnel.get("branches", [])] if funnel else []),
            "secondary": sorted(
                ({"name": s["name"], "fields": s["fields"]}
                 for s in v.get("secondary_identities", [])),
                key=lambda s: s["name"]),
        })
    es = []
    for e in sorted(g["edge_config"]["edges"],
                    key=lambda x: (x["source"], x["target"], str(x.get("relation")))):
        es.append({
            "source": e["source"], "target": e["target"],
            "relation": e.get("relation"),
            "directed": bool(e.get("directed", True)),
            # the bare endpoint pair is every edge's implicit default key;
            # normalize it away so declared-default and undeclared compare
            # equal (graft's EdgeDef cannot distinguish them either)
            "identities": [k for k in (e.get("identities") or [])
                           if sorted(k) != ["source", "target"]],
            "properties": [
                {"name": p["name"], **({"type": str(p["type"])} if p.get("type") else {})}
                for p in e.get("properties", [])],
        })
    return {"vertices": vs, "edges": es}


def run_case(c):
    m = GraphManifest.from_config(yaml.safe_load(c["manifest"]))
    m.finish_init()
    error = None
    schema = None
    try:
        ops = TypeAdapter(list[ManifestOp]).validate_python(c["ops"])
        out = apply_evolution(m, ops)
        schema = norm_schema(out)
    except Exception as e:
        error = f"{type(e).__name__}: {e}"
    return {"name": c["name"], "manifest": c["manifest"], "ops": c["ops"],
            "schema": schema, "error": error}


def main():
    print(json.dumps([run_case(c) for c in CASES], indent=1, default=str))


if __name__ == "__main__":
    main()
