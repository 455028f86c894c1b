#!/usr/bin/env python3
"""Regenerates src/test/resources/reference_actor_fixture.json by EXECUTING
the reference's actor/assembly runtime (DocumentCaster.cast_batch) over
small (manifest, docs) corner cases — ground truth for
ReferenceActorParitySpec. Driver-side tooling only (needs the reference
checkout; run from /root/repo so pyenv picks a python with its deps).

Each case records the manifest YAML (the exact text the Scala side loads),
the input docs, and the reference-emitted graph: vertices as property-dict
lists, edges as (src-identity, dst-identity, props) triples per
(source, target, relation) key.

Usage:
  PYTHONPATH=/tmp/refstubs:/root/reference python3 tools/gen_actor_fixture.py \
      > src/test/resources/reference_actor_fixture.json
"""
import sys, json, asyncio
sys.path.insert(0, '/tmp/refstubs'); sys.path.insert(0, '/root/reference')
import yaml
from graflo.architecture.contract.manifest import GraphManifest
from graflo.hq.document_caster import DocumentCaster
from graflo.hq.ingestion_parameters import IngestionParams

CASES = []

def case(name, manifest_yaml, docs, resource="r"):
    CASES.append({"name": name, "manifest": manifest_yaml, "docs": docs,
                  "resource": resource})

SCHEMA_PC = """
schema:
    metadata:
        name: t
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid, pname]
                identity: [pid]
            -   name: city
                properties: [cid, pop]
                identity: [cid]
        edge_config:
            edges:
            -   source: person
                target: city
"""

case("descend_key_pair", SCHEMA_PC + """
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: person
        -   key: homes
            pipeline:
            -   vertex: city
        -   source: person
            target: city
""", [
    {"pid": "p1", "pname": "Ann",
     "homes": [{"cid": "c1", "pop": 10}, {"cid": "c2", "pop": 20}]},
    {"pid": "p2", "pname": "Bob", "homes": [{"cid": "c3", "pop": 30}]},
])

case("descend_bare_list", SCHEMA_PC + """
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   key: people
            pipeline:
            -   vertex: person
            -   key: homes
                pipeline:
                -   vertex: city
            -   source: person
                target: city
""", [
    {"people": [
        {"pid": "p1", "pname": "Ann", "homes": [{"cid": "c1"}]},
        {"pid": "p2", "pname": "Bob", "homes": [{"cid": "c2"}, {"cid": "c3"}]},
    ]},
])

# any_key: iterate a map's entries; relation_from_key turns the map key
# into the edge relation (the debian-eco dependency pattern)
SCHEMA_PP = """
schema:
    metadata:
        name: t
    graph:
        vertex_config:
            vertices:
            -   name: package
                properties: [name]
                identity: [name]
        edge_config:
            edges:
            -   source: package
                target: package
"""
case("any_key_relation_from_key", SCHEMA_PP + """
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: package
        -   key: dependencies
            pipeline:
            -   any_key: true
                pipeline:
                -   vertex: package
        -   source: package
            target: package
            relation_from_key: true
""", [
    {"name": "alpha", "dependencies": {
        "depends": [{"name": "beta"}, {"name": "gamma"}],
        "suggests": [{"name": "delta"}]}},
    {"name": "beta", "dependencies": {"depends": [{"name": "gamma"}]}},
])

# same-type vertices in one doc at the SAME level -> COMBINATIONS pairing
case("edge_combinations_same_type", SCHEMA_PP + """
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   key: members
            pipeline:
            -   vertex: package
        -   source: package
            target: package
""", [
    {"members": [{"name": "a"}, {"name": "b"}, {"name": "c"}]},
    {"members": [{"name": "x"}, {"name": "y"}]},
])

# product: endpoints from two different descend branches
case("edge_product_branches", SCHEMA_PC + """
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   key: owners
            pipeline:
            -   vertex: person
        -   key: places
            pipeline:
            -   vertex: city
        -   source: person
            target: city
""", [
    {"owners": [{"pid": "p1"}, {"pid": "p2"}],
     "places": [{"cid": "c1"}, {"cid": "c2"}]},
])

# edge properties drawn from the enclosing document level (ticker t_obs
# pattern: edge_config + step-level `properties`)
case("edge_props_from_doc", """
schema:
    metadata:
        name: t
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid, pname]
                identity: [pid]
            -   name: city
                properties: [cid, pop]
                identity: [cid]
        edge_config:
            edges:
            -   source: person
                target: city
                properties: [t_obs]
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   transform:
                rename:
                    obs_date: t_obs
        -   vertex: person
        -   key: homes
            pipeline:
            -   vertex: city
        -   source: person
            target: city
            properties:
            -   t_obs
""", [
    {"pid": "p1", "obs_date": "2020-01-01",
     "homes": [{"cid": "c1"}, {"cid": "c2"}]},
])

# merge_doc_basis: the same vertex type observed at two locations in one
# document (partial observations with a shared identity merge last-wins)
case("merge_same_vertex_two_locations", SCHEMA_PC + """
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: person
        -   key: detail
            pipeline:
            -   vertex: person
""", [
    {"pid": "p1", "pname": "Ann", "detail": {"pid": "p1", "pname": "Anne"}},
    {"pid": "p2", "detail": {"pid": "p2", "pname": "Bo"}},
])

# keyless attachment: an identity-less observation of a vertex type
# attaches its fields to the doc's keyed observation of the same type
case("merge_keyless_attachment", SCHEMA_PC + """
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: person
        -   key: extra
            pipeline:
            -   vertex: person
""", [
    {"pid": "p1", "extra": {"pname": "Ann"}},
    {"pid": "p2", "extra": {"pname": "Bob"}},
])

# vertex_router with type_map + from-remap (objects-relations pattern)
SCHEMA_ROUTER = """
schema:
    metadata:
        name: t
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [id, full_name]
                identity: [id]
            -   name: vehicle
                properties: [id, model]
                identity: [id]
        edge_config:
            edges: []
"""
case("router_type_map", SCHEMA_ROUTER + """
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex_router:
                type_field: type
                type_map:
                    Person: person
                    Vehicle: vehicle
""", [
    {"type": "Person", "id": "P1", "full_name": "Ann A"},
    {"type": "Vehicle", "id": "V1", "model": "T800"},
    {"type": "Unknown", "id": "X1"},
])

case("router_dynamic_edge", SCHEMA_ROUTER + """
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex_router:
                type_field: source_type
                from:
                    id: source_id
                type_map:
                    Person: person
                    Vehicle: vehicle
        -   vertex_router:
                type_field: target_type
                from:
                    id: target_id
                type_map:
                    Person: person
                    Vehicle: vehicle
        -   edge:
                source_type_field: source_type
                target_type_field: target_type
                relation_field: relation_type
                relation_map:
                    OWNS: owns
                    KNOWS: knows
""", [
    {"source_type": "Person", "source_id": "P1",
     "target_type": "Vehicle", "target_id": "V1", "relation_type": "OWNS"},
    {"source_type": "Person", "source_id": "P1",
     "target_type": "Person", "target_id": "P2", "relation_type": "KNOWS"},
])

# roles: two same-type slots disambiguated by role (source_role/target_role)
SCHEMA_ROLES = """
schema:
    metadata:
        name: t
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid, pname]
                identity: [pid]
        edge_config:
            edges:
            -   source: person
                target: person
"""
case("role_slots", SCHEMA_ROLES + """
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   key: payer
            pipeline:
            -   vertex: person
                role: payer
        -   key: payee
            pipeline:
            -   vertex: person
                role: payee
        -   edge:
                source_role: payer
                target_role: payee
""", [
    {"payer": {"pid": "p1"}, "payee": {"pid": "p2"}},
    {"payer": {"pid": "p3"}, "payee": {"pid": "p1"}},
])

# transform with dress (key/value pivot, the ticker pattern)
case("transform_dress_pivot", """
schema:
    metadata:
        name: t
    graph:
        vertex_config:
            vertices:
            -   name: feature
                properties: [name, value]
                identity: [name, value]
        edge_config:
            edges: []
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   transform:
                call:
                    module: graflo.util.transform
                    foo: round_str
                    params:
                        ndigits: 2
                    input:
                    -   Open
                    dress:
                        key: name
                        value: value
        -   vertex: feature
""", [
    {"Open": "1.23456"},
    {"Open": "7.891"},
])

# rename + vertex from: field remap at the vertex step
case("vertex_from_remap", SCHEMA_PC + """
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: person
            from:
                pid: person_id
                pname: person_name
""", [
    {"person_id": "p1", "person_name": "Ann"},
    {"person_id": "p2"},
])

def main():
    from graflo.architecture.graph_types.merge import merge_doc_basis
    out = []
    for c in CASES:
        cfg = yaml.safe_load(c["manifest"])
        m = GraphManifest.from_config(cfg)
        m.finish_init()
        caster = DocumentCaster(m.require_ingestion_model())
        res = asyncio.run(caster.cast_batch(
            list(c["docs"]), c["resource"], params=IngestionParams()))
        g = res.graph
        # identity fields per vertex, straight from the manifest dict
        idents = {v["name"]: tuple(v.get("identity") or v["properties"])
                  for v in cfg["schema"]["graph"]["vertex_config"]["vertices"]}
        # compare at the per-identity plane every golden uses: the
        # reference's OWN merge_doc_basis over the emission-ordered rows
        # (assemble.py applies it per location; the store upsert closes the
        # cross-location merge), then drop keyless leftovers
        # (db_writer._drop_unkeyed_docs)
        vertices = {}
        for k, v in g.vertices.items():
            if not v:
                continue
            rows = merge_doc_basis([dict(r) for r in v], idents[k])
            rows = [r for r in rows if any(f in r for f in idents[k])]
            vertices[k] = sorted((dict(sorted(r.items())) for r in rows),
                key=lambda d: json.dumps(d, sort_keys=True, default=str))
        edges = []
        for k, rows in g.edges.items():
            if not rows:
                continue
            src, dst, rel = k[0], k[1], (k[2] if len(k) > 2 else None)
            rs = [{"src": dict(sorted(r[0].items())),
                   "dst": dict(sorted(r[1].items())),
                   "props": dict(sorted(r[2].items())) if len(r) > 2 and r[2] else {}}
                  for r in rows]
            rs.sort(key=lambda d: json.dumps(d, sort_keys=True, default=str))
            edges.append({"source": src, "target": dst, "relation": rel,
                          "rows": rs})
        edges.sort(key=lambda e: (e["source"], e["target"], str(e["relation"])))
        out.append({"name": c["name"], "manifest": c["manifest"],
                    "resource": c["resource"], "docs": c["docs"],
                    "vertices": vertices, "edges": edges})
    print(json.dumps(out, indent=1, default=str))

if __name__ == "__main__":
    main()
