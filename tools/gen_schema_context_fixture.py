#!/usr/bin/env python3
"""Regenerates src/test/resources/reference_schema_context_fixture.json by
EXECUTING the reference's bounded schema-context surface
(graflo/architecture/schema/context/: SchemaGraph, score_vertices,
subschema, build_card) — ground truth for ReferenceSchemaContextParitySpec.

What this pins:
  * SchemaGraph adjacency semantics: out/in/degree (self-loops twice),
    isolated types, relation vocabulary (None-relation edges excluded),
    schema_neighbors BFS (ANY default, undirected edges ignore the
    request, relation allow-lists where None is a valid member), and
    relations_between bounded simple-path enumeration (closing at the
    target allows self-cycles) with its (length, edge-key) ordering.
  * score_vertices: the exact composite float (hop decay power + weighted
    degree/identity/log-properties/index signals), blank-last, name
    tie-breaks — recorded scores compare bit-for-bit.
  * subschema: measured token budgeting over the reference's OWN compact
    serialization (budget.py serialize_compact over
    to_minimal_canonical_dict), envelope cost, ranked vertex admission,
    (min endpoint rank, edge key) edge admission, identity-protected
    property caps, the final measure-and-trim loop, and the elision
    report. The sliced schema is recorded as its serialized PAYLOAD
    STRING, so the Scala side's canonical-dict builder is pinned
    byte-for-byte.
  * build_card: the bounded orientation card, again as payload string +
    estimated_tokens.

Usage:
  PYTHONPATH=/tmp/refstubs:/root/reference python3 \
      tools/gen_schema_context_fixture.py \
      > src/test/resources/reference_schema_context_fixture.json
"""
import sys, json

sys.path.insert(0, '/tmp/refstubs'); sys.path.insert(0, '/root/reference')

from graflo.architecture.contract.manifest import GraphManifest
from graflo.architecture.graph_types import EdgeDirection
from graflo.architecture.schema.context import (
    SchemaGraph, build_card, subschema)
from graflo.architecture.schema.context.budget import (
    Budget, serialize_compact)
from graflo.architecture.schema.context.rank import (
    RankingWeights, score_vertices)

# ------------------------------------------------------------- schemas
# compact spec (also consumed by the Scala side): vertices carry name /
# properties ([name] or {name,type}) / identity|blank|assigned|hash|funnel
# / secondary; edges carry source/target/relation(null = undeclared)/directed.

CTX = {
    "metadata": {"name": "ctx", "version": "1.0.0"},
    "vertices": [
        {"name": "person", "properties": ["pid", "pname", "age"],
         "identity": ["pid"],
         "secondary": [{"name": "by_name", "fields": ["pname"]}]},
        {"name": "item",
         "properties": [{"name": "iid", "type": "INT"}, "price"],
         "identity": ["iid"]},
        {"name": "note", "properties": ["text"], "blank": True},
        {"name": "tag", "properties": ["label"], "identity": ["label"]},
        {"name": "island", "properties": ["z"], "identity": ["z"]},
        {"name": "hashv", "properties": ["u", "v"], "hash": ["u"]},
        {"name": "funv", "properties": ["p", "q"],
         "funnel": [{"id": "b1", "when_all_present": ["p"], "fields": ["p"]},
                    {"id": "b2", "when_all_present": ["q"], "fields": ["q"]}]},
    ],
    "edges": [
        {"source": "person", "target": "item", "relation": "likes"},
        {"source": "item", "target": "item", "relation": "similar",
         "directed": False},
        {"source": "person", "target": "person", "relation": "knows"},
        {"source": "person", "target": "tag", "relation": "tagged"},
        {"source": "note", "target": "person", "relation": None},
        {"source": "hashv", "target": "funv", "relation": "derives"},
    ],
}

HUB = {
    "metadata": {"name": "hub"},
    "vertices": [
        {"name": "h", "properties": ["k", "hname"], "identity": ["k"]},
    ] + [
        {"name": f"s{i}", "properties": [f"sk{i}", f"sa{i}", f"sb{i}"],
         "identity": [f"sk{i}"]}
        for i in range(1, 9)
    ] + [
        {"name": "island", "properties": ["z"], "identity": ["z"]},
    ],
    "edges": [
        {"source": "h", "target": f"s{i}", "relation": f"rel{i}"}
        for i in range(1, 9)
    ],
}

# semantics blocks (schema/semantics.py, meta-ontology 1.4.0): iri /
# exact_match / synonyms on vertices+edges, + unit on FIELDS only
SEM = {
    "metadata": {"name": "sem", "version": "3.0.0"},
    "vertices": [
        {"name": "person",
         "properties": [
             {"name": "height", "type": "FLOAT",
              "semantics": {"iri": "https://schema.org/height", "unit": "cm"}},
             "pname"],
         "identity": ["pid"],
         "semantics": {"iri": "https://schema.org/Person",
                       "exact_match": ["http://xmlns.com/foaf/0.1/Person"],
                       "synonyms": ["human", "individual"]}},
        {"name": "org", "properties": ["oid"], "identity": ["oid"]},
    ],
    "edges": [
        {"source": "person", "target": "org", "relation": "works_for",
         "semantics": {"iri": "https://schema.org/worksFor"}},
    ],
}

SCHEMAS = {"ctx": CTX, "hub": HUB, "sem": SEM}


def to_manifest(spec):
    vertices = []
    for v in spec["vertices"]:
        d = {"name": v["name"], "properties": list(v["properties"])}
        if v.get("semantics"):
            d["semantics"] = v["semantics"]
        if v.get("identity"):
            d["identity"] = v["identity"]
        if v.get("blank"):
            d["blank"] = True
        if v.get("assigned"):
            d["assigned"] = True
        if v.get("hash"):
            d["hash_identity_properties"] = v["hash"]
        if v.get("funnel"):
            d["identity_funnel"] = {"branches": v["funnel"]}
        if v.get("secondary"):
            d["secondary_identities"] = v["secondary"]
        vertices.append(d)
    edges = []
    for e in spec["edges"]:
        d = {"source": e["source"], "target": e["target"]}
        if e.get("relation") is not None:
            d["relation"] = e["relation"]
        if e.get("directed") is False:
            d["directed"] = False
        if e.get("semantics"):
            d["semantics"] = e["semantics"]
        edges.append(d)
    first = spec["vertices"][0]["name"]
    return {
        "schema": {"metadata": dict(spec["metadata"]),
                   "graph": {"vertex_config": {"vertices": vertices},
                             "edge_config": {"edges": edges}}},
        "ingestion_model": {"resources": [
            {"name": "r", "pipeline": [{"vertex": first}]}]},
    }


def load(name):
    m = GraphManifest.from_config(to_manifest(SCHEMAS[name]))
    m.finish_init()
    return m.require_schema()


def eid(edge_id):
    s, t, r = edge_id
    return [s, t, r]


def signals_dicts(signals):
    return [{"name": s.name, "hop_distance": s.hop_distance,
             "degree": s.degree, "identity_mode": s.identity_mode,
             "property_count": s.property_count,
             "has_secondary_index": s.has_secondary_index,
             "score": s.score} for s in signals]


CASES = []


def case(name, kind, schema, op=None):
    CASES.append({"name": name, "kind": kind, "schema": schema,
                  "op": op or {}})


# SchemaGraph structure
case("sg_structure", "structure", "ctx")
# schema_neighbors matrix
for nm, op in [
    ("sn_person_any1", {"vertex": "person", "hops": 1, "direction": "any"}),
    ("sn_person_out1", {"vertex": "person", "hops": 1, "direction": "out"}),
    ("sn_person_in1", {"vertex": "person", "hops": 1, "direction": "in"}),
    ("sn_item_any2", {"vertex": "item", "hops": 2, "direction": "any"}),
    ("sn_person_zero_hops", {"vertex": "person", "hops": 0, "direction": "any"}),
    ("sn_item_out1_undirected", {"vertex": "item", "hops": 1, "direction": "out",
                                 "edge_relations": ["similar"]}),
    ("sn_person_relation_filter", {"vertex": "person", "hops": 1,
                                   "direction": "any",
                                   "edge_relations": ["likes"]}),
    ("sn_none_relation_member", {"vertex": "person", "hops": 1,
                                 "direction": "any",
                                 "edge_relations": [None]}),
    ("sn_unknown_vertex", {"vertex": "nope", "hops": 1, "direction": "any"}),
    ("sn_negative_hops", {"vertex": "person", "hops": -1, "direction": "any"}),
]:
    case(nm, "neighbors", "ctx", op)
# relations_between
for nm, op in [
    ("rb_person_item", {"a": "person", "b": "item", "max_len": 3}),
    ("rb_person_person_cycles", {"a": "person", "b": "person", "max_len": 2}),
    ("rb_person_island_empty", {"a": "person", "b": "island", "max_len": 4}),
    ("rb_truncated", {"a": "person", "b": "item", "max_len": 4, "max_paths": 2}),
    ("rb_out_only", {"a": "item", "b": "person", "max_len": 2,
                     "direction": "out"}),
]:
    case(nm, "paths", "ctx", op)
# ranking
case("rank_structural", "rank", "ctx", {"seeds": []})
case("rank_seeded", "rank", "ctx", {"seeds": ["person"]})
case("rank_seeded_weights", "rank", "ctx",
     {"seeds": ["person"], "weights": {"hop_decay": 0.5, "degree": 0.3}})
case("rank_hub", "rank", "hub", {"seeds": ["h"], "max_hops": 1})
# subschema
case("ss_default", "subschema", "ctx", {"seeds": ["person"]})
case("ss_max_elements", "subschema", "hub",
     {"seeds": ["h"], "budget": {"max_elements": 4, "max_tokens": None}})
case("ss_max_tokens", "subschema", "hub",
     {"seeds": ["h"], "budget": {"max_elements": None, "max_tokens": 120}})
case("ss_tokens_trim", "subschema", "hub",
     {"seeds": ["h"], "budget": {"max_elements": None, "max_tokens": 200}})
case("ss_props_cap", "subschema", "ctx",
     {"seeds": ["person"],
      "budget": {"max_properties_per_vertex": 1}})
case("ss_seed_overrun", "subschema", "hub",
     {"seeds": ["h", "s1"], "budget": {"max_elements": None, "max_tokens": 30}})
case("ss_two_seeds", "subschema", "ctx",
     {"seeds": ["person", "hashv"],
      "budget": {"max_elements": 6, "max_tokens": None}})
case("ss_unknown_seed", "subschema", "ctx", {"seeds": ["nope"]})
case("ss_empty_seeds", "subschema", "ctx", {"seeds": []})
# semantics: dumps ride through slices byte-for-byte; unit is field-only
case("ss_semantics_payload", "subschema", "sem", {"seeds": ["person"]})
case("sem_unit_on_vertex_rejected", "semantics_invalid", "sem")
# card
case("card_ctx", "card", "ctx")
case("card_hub_bounds", "card", "hub", {"top_n": 2, "max_names": 2})
case("card_sem", "card", "sem")


def run_case(c):
    rec = dict(c)
    if c["kind"] == "semantics_invalid":
        # executed truth: `unit:` on a vertex is a validation error (the
        # FieldSemantics/Semantics split, semantics.py:39-51)
        bad = to_manifest(SCHEMAS[c["schema"]])
        bad["schema"]["graph"]["vertex_config"]["vertices"][0]["semantics"] = {
            "iri": "https://schema.org/Person", "unit": "kg"}
        try:
            GraphManifest.from_config(bad)
            rec["result"] = {"accepted": True}
            rec["error"] = None
        except Exception as e:
            rec["result"] = None
            rec["error"] = f"{type(e).__name__}"
        return rec
    sch = load(c["schema"])
    graph = SchemaGraph.from_schema(sch)
    op = c["op"]
    try:
        if c["kind"] == "structure":
            rec["result"] = {
                "vertex_types": sorted(graph.vertex_types),
                "edge_ids": [eid(k) for k in graph.edge_ids],
                "out": {n: [eid(k) for k in graph.out_edges(n)]
                        for n in sorted(graph.vertex_types)},
                "in": {n: [eid(k) for k in graph.in_edges(n)]
                       for n in sorted(graph.vertex_types)},
                "degree": {n: graph.degree(n)
                           for n in sorted(graph.vertex_types)},
                "isolated": graph.isolated_types(),
                "relations": graph.relation_vocabulary(),
            }
        elif c["kind"] == "neighbors":
            nb = graph.schema_neighbors(
                op["vertex"], hops=op["hops"],
                direction=EdgeDirection(op.get("direction", "any")),
                edge_relations=(set(op["edge_relations"])
                                if "edge_relations" in op else None))
            rec["result"] = {"distances": nb.distances,
                             "edges": [eid(k) for k in nb.edges],
                             "vertex_types": nb.vertex_types}
        elif c["kind"] == "paths":
            paths = graph.relations_between(
                op["a"], op["b"], max_len=op.get("max_len", 3),
                max_paths=op.get("max_paths", 20),
                direction=EdgeDirection(op.get("direction", "any")))
            rec["result"] = {"paths": [
                {"vertices": p.vertices, "edges": [eid(k) for k in p.edges]}
                for p in paths]}
        elif c["kind"] == "rank":
            w = RankingWeights(**op["weights"]) if op.get("weights") else None
            rec["result"] = {"signals": signals_dicts(score_vertices(
                graph, op.get("seeds", []), weights=w,
                max_hops=op.get("max_hops", 3)))}
        elif c["kind"] == "subschema":
            budget = Budget(**op["budget"]) if op.get("budget") else None
            sliced, report = subschema(
                sch, op["seeds"], budget=budget,
                max_hops=op.get("max_hops", 3))
            rec["result"] = {
                "payload": serialize_compact(sliced.to_minimal_canonical_dict()),
                "elided_vertices": [
                    {"name": e.name, "reason": e.reason, "degree": e.degree,
                     "hop_distance": e.hop_distance, "drill_in": e.drill_in}
                    for e in report.elided_vertices],
                "elided_edges": [
                    {"edge_id": eid(e.edge_id), "reason": e.reason}
                    for e in report.elided_edges],
                "elided_properties": report.elided_properties,
                "budget": {
                    "elements_used": report.budget.elements_used,
                    "estimated_tokens": report.budget.estimated_tokens,
                    "serialized_chars": report.budget.serialized_chars,
                    "exhausted_by": report.budget.exhausted_by},
                "truncated": report.truncated,
            }
        elif c["kind"] == "card":
            card = build_card(sch, top_n=op.get("top_n", 10),
                              max_names=op.get("max_names", 25))
            rec["result"] = {
                "payload": serialize_compact(card.to_minimal_canonical_dict()),
                "estimated_tokens": card.estimated_tokens,
            }
        rec["error"] = None
    except Exception as e:
        rec["result"] = None
        rec["error"] = f"{type(e).__name__}: {e}"
    return rec


def main():
    json.dump({"_generator": "tools/gen_schema_context_fixture.py",
               "schemas": SCHEMAS,
               "cases": [run_case(c) for c in CASES]},
              sys.stdout, indent=1, sort_keys=True)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
