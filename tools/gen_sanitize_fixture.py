#!/usr/bin/env python3
"""Regenerates src/test/resources/reference_sanitize_fixture.json by
EXECUTING the reference's SanitizeOp composition (apply.py:1368-1419
apply_sanitize) over (manifest, ops) corner cases — ground truth for
ReferenceSanitizeParitySpec.

Unlike the rewrite fixture (ingestion plane only), this one ALSO projects
the SCHEMA plane, because two of the three sanitize legs live there:

  1. db_profile storage-name sanitization (evolution/db_profile.py:257-321
     apply_storage_name_sanitization_to_db_profile): vertex storage names
     escape reserved words with `_vertex`; edge relation names escape with
     `_relation` and dedupe against the post-pass vertex storage-name set.
  2. vertex field renames (sanitize.py:64-95 compute_vertex_field_renames
     -> apply_rename_vertex_properties).
  3. TigerGraph consistent-identity-per-relation normalization
     (sanitize.py:98-257 normalize_relation_identity +
     _normalize_role_indexes, wired at apply.py:1409-1419 with
     apply_field_rename_to_db_profile + finish_init +
     rewrite_vertex_field_names_in_pipeline).

Projected planes per case (canonical JSON string, sort_keys/separators):
  schema:   vertices (name, identity list, properties name+type,
            secondary identities), db_profile vertex_storage_names /
            vertex_indexes (fields+unique) / edge_specs (sorted by edge
            id; relation_name + indexes)
  resources/bindings: same projection as the rewrite fixture.

Usage:
  sh tools/refstubs_setup.sh
  PYTHONPATH=/tmp/refstubs:/root/reference python3 tools/gen_sanitize_fixture.py \
      > src/test/resources/reference_sanitize_fixture.json
"""
import sys, json, os

sys.path.insert(0, '/tmp/refstubs'); sys.path.insert(0, '/root/reference')
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import yaml
from pydantic import TypeAdapter
from graflo.architecture.contract.manifest import GraphManifest
from graflo.architecture.evolution import apply_evolution
from graflo.architecture.evolution.ops import ManifestOp

from gen_rewrite_fixture import proj_resource, proj_bindings

CASES = []


def case(name, manifest_yaml, ops):
    CASES.append({"name": name, "manifest": manifest_yaml, "ops": ops})


def V(name, props, identity, secondary=None):
    d = {"name": name, "properties": props, "identity": identity}
    if secondary:
        d["secondary_identities"] = secondary
    return d


def M(vertices, edges, db_profile=None, pipeline=None):
    sch = {"metadata": {"name": "t"},
           "graph": {"vertex_config": {"vertices": vertices},
                     "edge_config": {"edges": edges}}}
    if db_profile:
        sch["db_profile"] = db_profile
    if pipeline is None:
        pipeline = [{"vertex": v["name"]} for v in vertices]
    return yaml.safe_dump(
        {"schema": sch,
         "ingestion_model": {"resources": [{"name": "r", "pipeline": pipeline}]}},
        sort_keys=False)


TG = [{"op": "sanitize", "db_flavor": "tigergraph"}]

# ------------------------------------------------- storage-name sanitize

# vertex NAMED a reserved gsql word -> storage name escapes with _vertex;
# a non-reserved sibling is untouched
case("san_storage_vertex_reserved", M(
    [V("vertex", ["vid"], ["vid"]), V("city", ["cid"], ["cid"])],
    [{"source": "vertex", "target": "city", "relation": "lives"}]), TG)

# AUTHORED storage name reserved -> rewritten in vertex_storage_names;
# the logical vertex name stays
case("san_storage_authored", M(
    [V("a", ["aid"], ["aid"]), V("b", ["bid"], ["bid"])],
    [{"source": "a", "target": "b", "relation": "knows"}],
    db_profile={"vertex_storage_names": {"a": "select", "b": "fine"}}), TG)

# relation named a reserved word -> relation_name escapes with _relation
# (a new edge spec is created when absent)
case("san_storage_relation_reserved", M(
    [V("a", ["aid"], ["aid"]), V("b", ["bid"], ["bid"])],
    [{"source": "a", "target": "b", "relation": "avg"}]), TG)

# sanitized relation collides with a vertex storage name -> _relation
# suffix; a second-level collision walks to _relation_1
case("san_storage_relation_collision", M(
    [V("a", ["aid"], ["aid"]), V("b", ["bid"], ["bid"]),
     V("c", ["cid2"], ["cid2"])],
    [{"source": "a", "target": "b", "relation": "avg"}],
    db_profile={"vertex_storage_names": {"b": "avg_relation"}}), TG)
case("san_storage_collision_loop", M(
    [V("a", ["aid"], ["aid"]), V("b", ["bid"], ["bid"]),
     V("c", ["cid2"], ["cid2"])],
    [{"source": "a", "target": "b", "relation": "avg"}],
    db_profile={"vertex_storage_names": {"b": "avg_relation",
                                         "c": "avg_relation_relation"}}), TG)

# an UNCHANGED (non-reserved) relation name that equals a vertex storage
# name still gains the _relation suffix (db_profile.py:299-311 runs the
# collision check before the != original test)
case("san_storage_unchanged_collides", M(
    [V("a", ["aid"], ["aid"]), V("hub", ["hid"], ["hid"])],
    [{"source": "a", "target": "hub", "relation": "hub"}]), TG)

# authored relation_name override is what gets sanitized (not the logical
# relation)
case("san_storage_authored_relname", M(
    [V("a", ["aid"], ["aid"]), V("b", ["bid"], ["bid"])],
    [{"source": "a", "target": "b", "relation": "fine"}],
    db_profile={"edge_specs": [
        {"source": "a", "target": "b", "relation": "fine",
         "relation_name": "min"}]}), TG)

# non-tigergraph flavor with EXPLICIT reserved words also hits the
# storage plane (plain sanitize_attribute_name, no identifier rules)
case("san_storage_explicit_generic", M(
    [V("a", ["aid"], ["aid"]), V("pick", ["pid2"], ["pid2"])],
    [{"source": "a", "target": "pick", "relation": "grab"}]),
    [{"op": "sanitize", "db_flavor": "neo4j",
      "reserved_words": ["PICK", "GRAB", "PICK_VERTEX"]}])

# tigergraph identifier rules on the STORAGE plane: invalid chars and the
# forbidden prefix rewrite storage names even when no word is reserved
case("san_storage_invalid_chars", M(
    [V("first name", ["fid"], ["fid"]), V("gsql_sys_tag", ["gid"], ["gid"])],
    [{"source": "first name", "target": "gsql_sys_tag", "relation": "fine"}]), TG)

# ------------------------------------------- identity normalization (nri)

# two edges share a relation; endpoint identities differ 1-1 in length ->
# zip rename (uid->pid), identity replaced, pipeline gains a from-map
case("nri_zip_rename", M(
    [V("person", ["pid", "x"], ["pid"]), V("user", ["uid", "uname"], ["uid"]),
     V("city", ["cid"], ["cid"])],
    [{"source": "person", "target": "city", "relation": "likes"},
     {"source": "user", "target": "city", "relation": "likes"}],
    pipeline=[{"vertex": "person", "from": {"pid": "raw"}},
              {"vertex": "user"}, {"vertex": "city"},
              {"edge": {"from": "person", "to": "city", "relation": "likes"}},
              {"edge": {"from": "user", "to": "city", "relation": "likes"}}]), TG)

# length mismatch: ['q'] vs ['k1','k2'] -> only q->k1 renames, k2 is
# APPENDED untyped; identity replaced wholesale; 2-1 vote picks [k1,k2]
case("nri_vote_and_added_field", M(
    [V("a", [{"name": "k1", "type": "STRING"}, {"name": "k2", "type": "INT"},
             "extra"], ["k1", "k2"]),
     V("b", [{"name": "k1", "type": "STRING"}, {"name": "k2", "type": "INT"}],
       ["k1", "k2"]),
     V("c", [{"name": "q", "type": "STRING"}], ["q"]),
     V("t", ["tid"], ["tid"])],
    [{"source": "a", "target": "t", "relation": "rel"},
     {"source": "b", "target": "t", "relation": "rel"},
     {"source": "c", "target": "t", "relation": "rel"}],
    pipeline=[{"vertex": "c"}, {"vertex": "t"},
              {"edge": {"from": "c", "to": "t", "relation": "rel"}}]), TG)

# 1-1 tie: Counter.most_common breaks on FIRST insertion (edge order) ->
# a's tuple wins, b renames
case("nri_tie_first_wins", M(
    [V("a", ["aid"], ["aid"]), V("b", ["bid"], ["bid"]),
     V("t", ["tid"], ["tid"])],
    [{"source": "a", "target": "t", "relation": "rel"},
     {"source": "b", "target": "t", "relation": "rel"}]), TG)

# secondary identities: normalize does NOT rename secondary fields, and
# the profile's authored index follows the rename while the derived
# lookup indexes re-register via finish_init
case("nri_secondary_and_indexes", M(
    [V("a", ["aid", "mail"], ["aid"],
       secondary=[{"name": "by_mail", "fields": ["mail"]}]),
     V("b", ["bid", "mail"], ["bid"],
       secondary=[{"name": "by_mail", "fields": ["mail"]}]),
     V("t", ["tid"], ["tid"])],
    [{"source": "a", "target": "t", "relation": "rel"},
     {"source": "b", "target": "t", "relation": "rel"}],
    db_profile={"vertex_indexes": {"b": [{"fields": ["bid"], "unique": False}]}}), TG)

# authored index on the renamed identity field NEXT TO a derived lookup
# index on an untouched field: the authored entry renames, the derived
# one re-registers unchanged (finish_init idempotency / ordering)
case("nri_authored_index_renamed", M(
    [V("a", ["aid"], ["aid"]),
     V("b", ["bid", "alt"], ["bid"],
       secondary=[{"name": "by_alt", "fields": ["alt"]}]),
     V("t", ["tid"], ["tid"])],
    [{"source": "a", "target": "t", "relation": "rel"},
     {"source": "b", "target": "t", "relation": "rel"}],
    db_profile={"vertex_indexes": {"b": [{"fields": ["bid"], "unique": True}]}}), TG)

# edge spec indexes rewrite with the MERGED source+target rename maps
case("nri_spec_indexes", M(
    [V("a", ["aid"], ["aid"]), V("b", ["bid"], ["bid"]),
     V("t", ["tid"], ["tid"])],
    [{"source": "a", "target": "t", "relation": "rel"},
     {"source": "b", "target": "t", "relation": "rel"}],
    db_profile={"edge_specs": [
        {"source": "b", "target": "t", "relation": "rel",
         "indexes": [{"fields": ["bid"], "unique": False}]}]}), TG)

# physical relation_name overrides GROUP the edges: two distinct logical
# relations with the same relation_name normalize together
case("nri_physical_relation_groups", M(
    [V("a", ["aid"], ["aid"]), V("b", ["bid"], ["bid"]),
     V("t", ["tid"], ["tid"])],
    [{"source": "a", "target": "t", "relation": "r1"},
     {"source": "b", "target": "t", "relation": "r2"}],
    db_profile={"edge_specs": [
        {"source": "a", "target": "t", "relation": "r1", "relation_name": "shared"},
        {"source": "b", "target": "t", "relation": "r2", "relation_name": "shared"}]}), TG)

# ... and distinct relation_names UN-group edges sharing a logical relation
case("nri_physical_relation_ungroups", M(
    [V("a", ["aid"], ["aid"]), V("b", ["bid"], ["bid"]),
     V("t", ["tid"], ["tid"])],
    [{"source": "a", "target": "t", "relation": "rel"},
     {"source": "b", "target": "t", "relation": "rel"}],
    db_profile={"edge_specs": [
        {"source": "a", "target": "t", "relation": "rel", "relation_name": "x1"},
        {"source": "b", "target": "t", "relation": "rel", "relation_name": "x2"}]}), TG)

# field sanitization interacts: the reserved field renames FIRST
# (avg -> avg_attr), then normalization compares the POST-rename tuples
case("nri_after_field_sanitize", M(
    [V("a", ["avg"], ["avg"]), V("b", ["avg"], ["avg"]),
     V("t", ["tid"], ["tid"])],
    [{"source": "a", "target": "t", "relation": "rel"},
     {"source": "b", "target": "t", "relation": "rel"}]), TG)

# a hash-identity vertex participates with its synthetic ['id'] tuple
# (vertex.py:884-902): natural-vertex-first edge order means ['aid'] wins
# and the hash vertex renames id->aid
case("nri_hash_vertex_loses", M(
    [V("a", ["aid"], ["aid"]),
     {"name": "h", "properties": ["h1", "h2"],
      "hash_identity_properties": ["h1", "h2"]},
     V("t", ["tid"], ["tid"])],
    [{"source": "a", "target": "t", "relation": "rel"},
     {"source": "h", "target": "t", "relation": "rel"}]), TG)

# same vertex renamed by TWO different relations: the per-vertex map
# accumulates; the second relation sees the first relation's result
case("nri_two_relations_accumulate", M(
    [V("a", ["aid"], ["aid"]), V("b", ["bid"], ["bid"]),
     V("c", ["cid2"], ["cid2"]), V("t", ["tid"], ["tid"])],
    [{"source": "a", "target": "t", "relation": "r1"},
     {"source": "b", "target": "t", "relation": "r1"},
     {"source": "b", "target": "t", "relation": "r2"},
     {"source": "c", "target": "t", "relation": "r2"}]), TG)

# the SAME vertex is source of one edge and target of another within one
# relation: both role lists are collected BEFORE the source role
# normalizes, so the target pass runs on the PRE-mutation tuples
case("nri_stale_target", M(
    [V("a", ["aid"], ["aid"]), V("b", ["bid"], ["bid"]),
     V("m", ["mid"], ["mid"])],
    [{"source": "a", "target": "m", "relation": "rel"},
     {"source": "m", "target": "b", "relation": "rel"}]), TG)

# non-tigergraph flavor: normalization is a no-op even with explicit
# reserved words (sanitize.py:276-278)
case("nri_non_tg_noop", M(
    [V("a", ["aid"], ["aid"]), V("b", ["bid"], ["bid"]),
     V("t", ["tid"], ["tid"])],
    [{"source": "a", "target": "t", "relation": "rel"},
     {"source": "b", "target": "t", "relation": "rel"}]),
    [{"op": "sanitize", "db_flavor": "neo4j", "reserved_words": ["AVG"]}])

# composite identities of equal length: positional zip, only differing
# positions rename (k2 shared -> only k1/j1 renames)
case("nri_partial_zip", M(
    [V("a", ["k1", "k2"], ["k1", "k2"]),
     V("b", ["j1", "k2"], ["j1", "k2"]),
     V("t", ["tid"], ["tid"])],
    [{"source": "a", "target": "t", "relation": "rel"},
     {"source": "b", "target": "t", "relation": "rel"}]), TG)

# overlapping old/new tuples ("a","b") -> ("b","c"): the rename map is
# {a->b, b->c} and the property walk must not collapse them wrongly
# (sanitize.py:150-166 seen_names dedup)
case("nri_overlapping_tuples", M(
    [V("v1", ["fa", "fb"], ["fa", "fb"]),
     V("v2", ["fb", "fc"], ["fb", "fc"]),
     V("t", ["tid"], ["tid"])],
    [{"source": "v1", "target": "t", "relation": "rel"},
     {"source": "v2", "target": "t", "relation": "rel"}]), TG)

# normalize rewrites the ingestion pipeline through the SAME from-map
# rewrite as property renames — a vertex step with an existing from-map
# composes, one without gains the map
case("nri_pipeline_from_map", M(
    [V("a", ["aid"], ["aid"]), V("b", ["bid"], ["bid"]),
     V("t", ["tid"], ["tid"])],
    [{"source": "a", "target": "t", "relation": "rel"},
     {"source": "b", "target": "t", "relation": "rel"}],
    pipeline=[{"vertex": "a"},
              {"vertex": "b", "from": {"bid": "raw_b"}},
              {"vertex": "t"},
              {"edge": {"from": "b", "to": "t", "relation": "rel"}}]), TG)


# ------------------------------------------------------------ projection

def proj_vertex(v):
    return {"name": v.name,
            "identity": list(v.identity),
            "properties": [{"name": f.name, "type": f.type} for f in v.properties],
            "secondary": [{"name": s.name, "fields": list(s.fields)}
                          for s in v.secondary_identities]}


def proj_schema(s):
    prof = s.db_profile
    return {
        "vertices": [proj_vertex(v) for v in s.core_schema.vertex_config.vertices],
        "vertex_storage_names": {k: prof.vertex_storage_names[k]
                                 for k in sorted(prof.vertex_storage_names)},
        "vertex_indexes": {k: [{"fields": list(i.fields), "unique": i.unique}
                               for i in ixs]
                           for k, ixs in sorted(prof.vertex_indexes.items())
                           if ixs},
        "edge_specs": sorted(
            [{"source": sp.source, "target": sp.target,
              "relation": sp.relation, "relation_name": sp.relation_name,
              "indexes": [{"fields": list(i.fields), "unique": i.unique}
                          for i in sp.indexes]}
             for sp in prof.edge_specs],
            key=lambda d: (d["source"], d["target"], d["relation"] or "")),
    }


def proj_manifest(m):
    return {"schema": proj_schema(m.graph_schema),
            "resources": [proj_resource(r) for r in m.ingestion_model.resources],
            "bindings": proj_bindings(m.bindings)}


def dumps(x):
    return json.dumps(x, sort_keys=True, separators=(",", ":"), default=str)


def run_case(c):
    m = GraphManifest.from_config(yaml.safe_load(c["manifest"]))
    m.finish_init()
    before = dumps(proj_manifest(m))
    error = None
    after = None
    try:
        ops = TypeAdapter(list[ManifestOp]).validate_python(c["ops"])
        out = apply_evolution(m, ops)
        after = dumps(proj_manifest(out))
    except Exception as e:
        error = f"{type(e).__name__}: {e}"
    return {"name": c["name"], "manifest": c["manifest"], "ops": c["ops"],
            "before": before, "after": after, "error": error}


def main():
    print(json.dumps([run_case(c) for c in CASES], indent=1, default=str))


if __name__ == "__main__":
    main()
