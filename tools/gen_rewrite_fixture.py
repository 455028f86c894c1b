#!/usr/bin/env python3
"""Regenerates src/test/resources/reference_rewrite_fixture.json by
EXECUTING the reference's evolution INGESTION-MODEL cascade
(`apply_evolution`, graflo/architecture/evolution/{apply,rewrite,identity,
structure,inverse_edges}.py) over (manifest, ops) corner cases — ground
truth for ReferenceRewriteParitySpec.

The comparison plane is the INGESTION block (plus bindings resource rows)
of the evolved manifest, projected to the parts the cascade rewrites:

  resources: name, pipeline (raw step dicts, exactly as the rewrite
             functions leave them), merge_collections, infer_edge_only/
             except (minimal spec dicts), extra_weights (edge triple +
             Weight.to_dict(skip_defaults=False) vertex weights)
  bindings:  resource_connector rows

Because the reference NORMALIZES some pipeline payloads at manifest LOAD
time (descend `apply`→`pipeline`, inner step `type` tags), each case
records the post-load, PRE-op projection too ("before"); graft's cascade
starts from that recorded document, so the fixture pins the CASCADE
semantics, not the loader's.

`error` is non-null when the reference itself rejects the op sequence
(executed truth — both engines owe the rejection).

Usage:
  PYTHONPATH=/tmp/refstubs:/root/reference python3 tools/gen_rewrite_fixture.py \
      > src/test/resources/reference_rewrite_fixture.json
"""
import sys, json

sys.path.insert(0, '/tmp/refstubs'); sys.path.insert(0, '/root/reference')
import yaml
from pydantic import TypeAdapter
from graflo.architecture.contract.manifest import GraphManifest
from graflo.architecture.evolution import apply_evolution
from graflo.architecture.evolution.ops import ManifestOp, ops_reaching_ingestion

CASES = []


def case(name, manifest_yaml, ops, inject=None):
    """`inject`: raw step dicts appended to resource "r"'s pipeline AFTER
    load (GraphManifest.from_config validates every YAML step through the
    same pydantic adapter, so an EdgeActorConfig-INVALID payload can never
    arrive via YAML — but Resource.pipeline is a raw list[dict], so
    programmatically-built manifests and post-rewrite states can hold
    them; add_inverse_edges must classify those too). Injected steps are
    part of the recorded `before` projection, so graft replays them.
    """
    CASES.append({"name": name, "manifest": manifest_yaml, "ops": ops,
                  "inject": inject})


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
                properties: [cid, cname, pop]
                identity: [cid]
            -   name: company
                properties:
                -   {name: coid, type: STRING}
                -   {name: industry, type: STRING}
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
    -   name: people
        merge_collections: [person]
        pipeline:
        -   transform:
                rename: {raw_name: pname, raw_age: age}
        -   vertex: person
            from: {pid: id, pname: display}
            keep_fields: [pname, age]
        -   descend:
                key: hometown
                apply:
                -   vertex: city
                -   edge:
                        from: person
                        to: city
                        relation: lives_in
                        vertex_weights:
                        -   name: city
                            fields: [pop]
                            map: {pop: size}
                            filter: {cname: x}
    -   name: jobs
        pipeline:
        -   vertex: person
        -   vertex: company
        -   edge:
                from: person
                to: company
                relation: works_at
                properties: [since, {name: role, type: STRING}]
        infer_edge_only:
        -   {source: company, target: city, relation: based_in}
        extra_weights:
        -   edge: {source: person, target: company, relation: works_at}
            vertex_weights:
            -   name: company
                fields: [industry]
bindings:
    connectors:
    -   {name: files, table_name: people}
    resource_connector:
    -   {resource: people, connector: files}
    -   {resource: jobs, connector: files}
"""

ROUTED = """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: city
                properties: [cid, pop]
                identity: [cid]
            -   name: company
                properties: [coid]
                identity: [coid]
            -   name: org
                properties: [oid]
                identity: [oid]
        edge_config:
            edges:
            -   source: company
                target: city
                relation: based_in
ingestion_model:
    resources:
    -   name: routed
        pipeline:
        -   vertex_router:
                type_field: kind
                type_map: {c: city, co: company}
                vertex_from_map:
                    city: {cid: raw_id}
                    company: {coid: raw_id}
        -   edge:
                from: company
                to: city
                relation: based_in
"""

# ------------------------------------------------------- vertex renames

case("rv_pipeline", BASE, [
    {"op": "rename_vertices", "vertices": {"person": "human"}}])
case("rv_swap", BASE, [
    {"op": "rename_vertices", "vertices": {"person": "city", "city": "person"}}])
case("rv_unknown", BASE, [
    {"op": "rename_vertices", "vertices": {"ghost": "spirit"}}])
case("rv_collision", BASE, [
    {"op": "rename_vertices", "vertices": {"person": "city"}}])
case("rv_router", ROUTED, [
    {"op": "rename_vertices", "vertices": {"company": "firm"}}])

# ----------------------------------------------------- relation renames

case("rr_basic", BASE, [
    {"op": "rename_relations", "relations": {"lives_in": "resides_in"}}])
case("rr_two", BASE, [
    {"op": "rename_relations",
     "relations": {"lives_in": "resides_in", "works_at": "employed_by"}}])
case("rr_unknown", BASE, [
    {"op": "rename_relations", "relations": {"ghost_rel": "x"}}])

RELMAP = """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: a
                properties: [aid]
                identity: [aid]
            -   name: b
                properties: [bid]
                identity: [bid]
        edge_config:
            edges:
            -   {source: a, target: b, relation: r1}
            -   {source: a, target: b, relation: r2}
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: a
        -   vertex: b
        -   edge:
                from: a
                to: b
                relation_field: rel
                relation_map: {one: r1, two: r2}
"""
case("rr_relation_map", RELMAP, [
    {"op": "rename_relations", "relations": {"r1": "r1x"}}])
case("me_basic", RELMAP, [
    {"op": "merge_edges", "sources": ["r1"], "into": "r2"}])
case("rme_relation_map", RELMAP, [
    {"op": "remove_edges", "relations": ["r1"]}])

# ----------------------------------------------------- resource renames

case("rres_basic", BASE, [
    {"op": "rename_resources", "resources": {"people": "persons"}}])
case("rres_unknown", BASE, [
    {"op": "rename_resources", "resources": {"ghost": "g2"}}])
case("rres_collision", BASE, [
    {"op": "rename_resources", "resources": {"people": "jobs"}}])

# ------------------------------------------------------ vertex removal

case("remv_drop_resource", BASE, [
    {"op": "remove_vertices", "names": ["company"]}])
case("remv_empty_error", BASE, [
    {"op": "remove_vertices", "names": ["person"]}])
case("remv_unknown", BASE, [
    {"op": "remove_vertices", "names": ["ghost"]}])

TXONLY = BASE.replace("""    -   name: jobs
        pipeline:
        -   vertex: person
        -   vertex: company
""", """    -   name: txonly
        pipeline:
        -   transform:
                rename: {x: y}
    -   name: jobs
        pipeline:
        -   vertex: person
        -   vertex: company
""")
case("remv_txonly_dropped", TXONLY, [
    {"op": "remove_vertices", "names": ["company"]}])

MC = """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: a
                properties: [aid]
                identity: [aid]
            -   name: b
                properties: [bid]
                identity: [bid]
        edge_config:
            edges: []
ingestion_model:
    resources:
    -   name: ra
        merge_collections: [a, b]
        pipeline:
        -   vertex: a
    -   name: rb
        pipeline:
        -   vertex: b
"""
case("remv_merge_collections", MC, [
    {"op": "remove_vertices", "names": ["b"]}])

# -------------------------------------------------------- vertex merges

case("mv_pipeline", BASE, [
    {"op": "merge_vertices", "sources": ["company"], "into": "org"}])
case("mv_self_relation", BASE, [
    {"op": "merge_vertices", "sources": ["city"], "into": "company"}])
case("mv_self_allowed", BASE, [
    {"op": "merge_vertices", "sources": ["city"], "into": "company",
     "allow_self_relations": True}])
case("mv_row_fusion", BASE, [
    {"op": "merge_vertices", "sources": ["company"], "into": "person",
     "allow_self_relations": True}])
case("mv_fusion_allowed", BASE, [
    {"op": "merge_vertices", "sources": ["company"], "into": "person",
     "allow_self_relations": True, "allow_row_fusion": True}])
case("mv_vfm_union", ROUTED, [
    {"op": "merge_vertices", "sources": ["city", "company"], "into": "org",
     "allow_self_relations": True, "allow_row_fusion": True}])

# a REAL from-map conflict: the same vertex FIELD reads different doc
# columns for the two merged sources
VFM_CONFLICT = ROUTED.replace(
    "city: {cid: raw_id}", "city: {xid: city_col}").replace(
    "company: {coid: raw_id}", "company: {xid: company_col}")
case("mv_vfm_conflict", VFM_CONFLICT, [
    {"op": "merge_vertices", "sources": ["city", "company"], "into": "org",
     "allow_self_relations": True, "allow_row_fusion": True}])

# ------------------------------------------------------ property renames

case("rp_from_map", BASE, [
    {"op": "rename_vertex_properties", "renames": {"person": {"pname": "full_name"}}}])
case("rp_no_from", BASE, [
    {"op": "rename_vertex_properties", "renames": {"city": {"pop": "population"}}}])
case("rp_transform_rename", BASE, [
    {"op": "rename_vertex_properties", "renames": {"person": {"age": "years"}}}])
case("rp_weights", BASE, [
    {"op": "rename_vertex_properties",
     "renames": {"city": {"pop": "population", "cname": "city_name"}}}])
case("rp_extra_weights", BASE, [
    {"op": "rename_vertex_properties", "renames": {"company": {"industry": "sector"}}}])
case("rp_unknown_vertex", BASE, [
    {"op": "rename_vertex_properties", "renames": {"ghost": {"a": "b"}}}])
case("rp_identity_field", BASE, [
    {"op": "rename_vertex_properties", "renames": {"person": {"pid": "person_id"}}}])

# ----------------------------------------------------- property removals

case("rmp_from_keep", BASE, [
    {"op": "remove_vertex_properties", "removals": {"person": ["pname"]}}])
case("rmp_transform_blocked", BASE, [
    {"op": "remove_vertex_properties", "removals": {"person": ["age"]}}])
case("rmp_weights", BASE, [
    {"op": "remove_vertex_properties", "removals": {"city": ["pop"]}}])
case("rmp_extra_weights", BASE, [
    {"op": "remove_vertex_properties", "removals": {"company": ["industry"]}}])
case("rmp_identity_error", BASE, [
    {"op": "remove_vertex_properties", "removals": {"person": ["pid"]}}])

# --------------------------------------------------------- edge removal

case("rme_wrapped", BASE, [
    {"op": "remove_edges", "relations": ["lives_in"]}])
case("rme_keeps_other", BASE, [
    {"op": "remove_edges", "relations": ["based_in"]}])
# bugs-as-truth probe: after a property rename normalizes the pipeline,
# edge steps are FLAT (`type: edge`, no nested payload); remove_edges'
# final "nothing left" check then sees them without a relation gate
case("rme_after_normalize", BASE, [
    {"op": "rename_vertex_properties", "renames": {"person": {"age": "years"}}},
    {"op": "remove_edges", "relations": ["based_in"]}])

FLAT_UNTYPED = """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: a
                properties: [aid]
                identity: [aid]
            -   name: b
                properties: [bid]
                identity: [bid]
        edge_config:
            edges:
            -   {source: a, target: b, relation: r1}
            -   {source: a, target: b, relation: r2}
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: a
        -   vertex: b
        -   {from: a, to: b, relation: r1}
        -   {from: a, to: b, relation: r2}
"""
case("rme_flat_untyped", FLAT_UNTYPED, [
    {"op": "remove_edges", "relations": ["r1"]}])

# ------------------------------------------------- edge property renames

case("rep_properties", BASE, [
    {"op": "rename_edge_properties", "renames": {"works_at": {"since": "start_date"}}}])
case("rmep_properties", BASE, [
    {"op": "remove_edge_properties", "removals": {"works_at": ["role"]}}])

# ------------------------------------------------------ replace identity

PIN = """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid, ssn, email]
                identity: [pid]
            -   name: city
                properties: [cid]
                identity: [cid]
        edge_config:
            edges:
            -   source: person
                target: city
                relation: lives_in
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: person
        -   vertex: city
        -   edge:
                from: person
                to: city
                relation: lives_in
"""
PIN_WITH_SECONDARY = PIN.replace("""                properties: [pid, ssn, email]
                identity: [pid]""", """                properties: [pid, ssn, email]
                identity: [pid]
                secondary_identities:
                -   {name: email_lookup, fields: [email]}""").replace(
    """        -   edge:
                from: person
                to: city
                relation: lives_in
""", """        -   edge:
                from: person
                to: city
                relation: lives_in
        -   edge:
                from: person
                to: city
                relation: lives_in
                source_match: email_lookup
""")

case("ri_pin", PIN, [
    {"op": "replace_identity", "vertices": {"person": {
        "to": {"mode": "natural", "identity": ["ssn"]},
        "retire": "demote", "endpoints": "pin_to_retired"}}}])
case("ri_pin_retire_as", PIN, [
    {"op": "replace_identity", "vertices": {"person": {
        "to": {"mode": "natural", "identity": ["ssn"]},
        "retire": "demote", "retire_as": "legacy_pid",
        "endpoints": "pin_to_retired"}}}])
case("ri_pin_explicit_secondary", PIN_WITH_SECONDARY, [
    {"op": "replace_identity", "vertices": {"person": {
        "to": {"mode": "natural", "identity": ["ssn"]},
        "retire": "demote", "endpoints": "pin_to_retired"}}}])
case("ri_pin_name_clash", PIN.replace("""                properties: [pid, ssn, email]
                identity: [pid]""", """                properties: [pid, ssn, email]
                identity: [pid]
                secondary_identities:
                -   {name: retired_identity, fields: [email]}"""), [
    {"op": "replace_identity", "vertices": {"person": {
        "to": {"mode": "natural", "identity": ["ssn"]},
        "retire": "demote", "endpoints": "pin_to_retired"}}}])

DROP = """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid, ssn]
                identity: [pid]
        edge_config:
            edges: []
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   transform:
                rename: {raw: pid}
        -   vertex: person
            from: {pid: raw_pid, ssn: raw_ssn}
            keep_fields: [pid, ssn]
"""
# the drop cascade empties the transform's rename map and the reference's
# finish_init then rejects the now-payload-less transform (executed truth)
case("ri_drop_empties_transform", DROP, [
    {"op": "replace_identity", "vertices": {"person": {
        "to": {"mode": "natural", "identity": ["ssn"]}, "retire": "drop"}}}])
case("ri_drop_fields", DROP.replace(
    "rename: {raw: pid}", "rename: {raw: pid, raw_ssn: ssn}"), [
    {"op": "replace_identity", "vertices": {"person": {
        "to": {"mode": "natural", "identity": ["ssn"]}, "retire": "drop"}}}])

# ------------------------------------------------------------- retarget

RT = """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: a
                properties: [aid]
                identity: [aid]
            -   name: b
                properties: [bid]
                identity: [bid]
            -   name: c
                properties: [ccid]
                identity: [ccid]
        edge_config:
            edges:
            -   {source: a, target: b, relation: r1}
            -   {source: a, target: b, relation: r2}
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: a
        -   vertex: b
        -   vertex: c
        -   edge: {from: a, to: b, relation: r1}
        -   edge: {from: a, to: b, relation: r2}
"""
case("rt_basic", RT, [
    {"op": "retarget_edges", "edges": [
        {"source": "a", "target": "b", "relation": "r1",
         "new_source": "a", "new_target": "c"}]}])

# ----------------------------------------------------------- projection

case("pm_keep", BASE, [
    {"op": "project_manifest", "keep_vertices": ["person", "company"],
     "keep_resources": ["jobs"]}])
case("pm_keep_missing", BASE, [
    {"op": "project_manifest", "keep_vertices": ["person", "company", "city"],
     "keep_resources": ["ghost"]}])

# -------------------------------------------------------- inverse edges

case("inv_flat", BASE, [
    {"op": "add_inverse_edges", "relations": {"works_at": "employs"}}])
case("inv_two", BASE, [
    {"op": "add_inverse_edges",
     "relations": {"works_at": "employs", "lives_in": "hosts"}}])

INV_DUP = BASE.replace("""        -   edge:
                from: person
                to: company
                relation: works_at
                properties: [since, {name: role, type: STRING}]
""", """        -   edge:
                from: person
                to: company
                relation: works_at
                properties: [since, {name: role, type: STRING}]
        -   edge:
                from: company
                to: person
                relation: employs
""")
case("inv_dedup", INV_DUP, [
    {"op": "add_inverse_edges", "relations": {"works_at": "employs"}}])
case("inv_relation_map", RELMAP, [
    {"op": "add_inverse_edges", "relations": {"r1": "r1_inv"}}])

# ----------------------------------------------------- multi-op chains

case("chain_rename_then_remove", BASE, [
    {"op": "rename_vertices", "vertices": {"company": "firm"}},
    {"op": "remove_vertices", "names": ["firm"]}])
case("chain_prop_then_merge", BASE, [
    {"op": "rename_vertex_properties", "renames": {"city": {"pop": "population"}}},
    {"op": "merge_vertices", "sources": ["company"], "into": "org"}])


LINKS = """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: a
                properties: [aid]
                identity: [aid]
            -   name: b
                properties: [bid]
                identity: [bid]
        edge_config:
            edges:
            -   {source: a, target: b, relation: r1}
            -   {source: a, target: b, relation: r2}
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: a
        -   vertex: b
        -   edge:
                links:
                -   {from: a, to: b, relation: r1}
                -   {from: a, to: b, relation: r2}
"""
# links path: only the mapped link inverts; the inverse step is the bare
# {type: edge, links: [...]} shape
case("inv_links", LINKS, [
    {"op": "add_inverse_edges", "relations": {"r1": "r1_inv"}}])
case("inv_links_both", LINKS, [
    {"op": "add_inverse_edges", "relations": {"r1": "r1_inv", "r2": "r2_inv"}}])

# ------------------------------------- inverse edges: INVALID payloads
#
# The reference runs EdgeActorConfig.model_validate on each normalized
# edge payload and SKIPS (returns None for) payloads that fail —
# inverse_edges.py:274-277 (pydantic extra=forbid + field types). These
# cases pin the skip-vs-invert classification on validation FAILURES,
# which a purely structural classifier would get wrong. Payloads arrive
# via `inject` (see `case`): YAML load would reject them.

INV_BASE = yaml.safe_dump({
    "schema": {"metadata": {"name": "t"}, "graph": {
        "vertex_config": {"vertices": [
            {"name": "a", "properties": ["aid"], "identity": ["aid"]},
            {"name": "b", "properties": ["bid"], "identity": ["bid"]}]},
        "edge_config": {"edges": [
            {"source": "a", "target": "b", "relation": "r1",
             "properties": ["w1"]}]}}},
    "ingestion_model": {"resources": [{"name": "r", "pipeline":
        [{"vertex": "a"}, {"vertex": "b"}]}]}}, sort_keys=False)

INV_OP = [{"op": "add_inverse_edges", "relations": {"r1": "r1_inv"}}]
case("inv_invalid_extra_key", INV_BASE, INV_OP, inject=[
    {"edge": {"from": "a", "to": "b", "relation": "r1", "frobnicate": 1}}])
case("inv_invalid_props_scalar", INV_BASE, INV_OP, inject=[
    {"edge": {"from": "a", "to": "b", "relation": "r1", "properties": 13}}])
case("inv_invalid_relmap_list", INV_BASE, INV_OP, inject=[
    {"edge": {"from": "a", "to": "b", "relation_field": "rf",
              "relation_map": ["x", "y"]}}])
case("inv_invalid_on_ambiguous", INV_BASE, INV_OP, inject=[
    {"edge": {"from": "a", "to": "b", "relation": "r1",
              "on_ambiguous": "sometimes"}}])
case("inv_invalid_source_int", INV_BASE, INV_OP, inject=[
    {"edge": {"from": 7, "to": "b", "relation": "r1"}}])
case("inv_invalid_strict_scalar", INV_BASE, INV_OP, inject=[
    {"edge": {"from": "a", "to": "b", "relation": "r1",
              "strict_edge_types": "maybe"}}])
# one invalid link entry fails the WHOLE config validate -> even the
# valid sibling link is skipped
case("inv_invalid_link_entry", INV_BASE, INV_OP, inject=[
    {"edge": {"links": [
        {"from": "a", "to": "b", "relation": "r1"},
        {"from": "a", "to": "b", "relation": "r1", "bogus": 2}]}}])
# a link may not carry config-only keys (relation_map is EdgeActorConfig-
# level, not EdgeLinkConfig-level)
case("inv_invalid_link_relmap", INV_BASE, INV_OP, inject=[
    {"edge": {"links": [
        {"from": "a", "to": "b", "relation": "r1",
         "relation_map": {"x": "r1"}}]}}])
# valid + invalid side by side: the valid payload still inverts
case("inv_invalid_mixed", INV_BASE, INV_OP, inject=[
    {"edge": {"from": "a", "to": "b", "relation": "r1"}},
    {"edge": {"from": "a", "to": "b", "relation": "r1", "frobnicate": 1}}])
# VALID control exercising config-surface fields the validator must
# ACCEPT (description, on_ambiguous literal, bool strict_edge_types,
# properties/vertex_weights lists) — EdgeActorConfig-valid, so the
# inverse appends and the op succeeds
case("inv_valid_full_surface", INV_BASE, INV_OP, inject=[
    {"edge": {"from": "a", "to": "b", "relation": "r1",
              "description": "hi", "on_ambiguous": "first",
              "strict_edge_types": True,
              "properties": ["w1"], "vertex_weights": []}}])

# -------------------------------------------------------------- sanitize

SAN = """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid, select, order_col, rank]
                identity: [pid]
            -   name: city
                properties: [cid, level]
                identity: [cid]
        edge_config:
            edges:
            -   source: person
                target: city
                relation: lives_in
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   transform:
                rename: {raw_sel: select, raw_rank: rank}
        -   vertex: person
            from: {select: raw_sel2}
            keep_fields: [select, rank]
        -   vertex: city
        -   edge:
                from: person
                to: city
                relation: lives_in
                vertex_weights:
                -   name: city
                    fields: [level]
"""
# `select` is reserved AND its _attr escape is reserved too -> numeric
# suffix; `rank` and `level` sanitize plainly; `order_col` is NOT the
# reserved word `order` (whole-name match only)
case("san_fields", SAN, [
    {"op": "sanitize", "db_flavor": "neo4j",
     "reserved_words": ["SELECT", "SELECT_ATTR", "RANK", "LEVEL", "ORDER"]}])
case("san_noop", SAN, [
    {"op": "sanitize", "db_flavor": "neo4j", "reserved_words": ["FROBNICATE"]}])
case("san_identity_field", SAN, [
    {"op": "sanitize", "db_flavor": "neo4j", "reserved_words": ["PID"]}])

# ------------------------------------ sanitize: per-flavor DEFAULTS
#
# With reserved_words ABSENT the reference loads the flavor's default
# set (db/util.py load_reserved_words: only TIGERGRAPH is non-empty —
# gsql + cpp keywords, upper) and, for TigerGraph, ALSO applies the
# identifier rules: invalid chars -> '__', forbidden prefix gsql_sys_
# -> 'tg_' prepend (sanitize_tigergraph_identifier).

SAN_TG = """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid, avg, auto, 'first name', gsql_sys_tag, vertex, plain]
                identity: [pid]
            -   name: city
                properties: [cid]
                identity: [cid]
        edge_config:
            edges:
            -   source: person
                target: city
                relation: lives_in
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: person
            from: {avg: raw_avg}
        -   vertex: city
        -   edge:
                from: person
                to: city
                relation: lives_in
"""
# avg (gsql) + auto (cpp) + vertex (gsql) rename; 'first name' gets the
# invalid-char replacement; gsql_sys_tag the forbidden-prefix prepend
case("san_default_tigergraph", SAN_TG, [
    {"op": "sanitize", "db_flavor": "tigergraph"}])
# explicit list on tigergraph: the list REPLACES the default reserved
# words (auto/vertex stay) but identifier rules still run
case("san_default_tg_explicit", SAN_TG, [
    {"op": "sanitize", "db_flavor": "tigergraph", "reserved_words": ["AVG"]}])
# explicit EMPTY list on tigergraph: falsy -> effective set falls back
# to the rules' defaults (db_profile.py effective_reserved = a or b)
case("san_default_tg_explicit_empty", SAN_TG, [
    {"op": "sanitize", "db_flavor": "tigergraph", "reserved_words": []}])
# non-tigergraph flavor with no explicit list: empty default -> no-op
case("san_default_generic", SAN_TG, [
    {"op": "sanitize", "db_flavor": "neo4j"}])


def proj_resource(r):
    return {
        "name": r.name,
        "pipeline": r.pipeline,
        "merge_collections": list(r.merge_collections),
        "infer_edge_only": [s.model_dump(by_alias=True, exclude_none=True)
                            for s in r.infer_edge_only],
        "infer_edge_except": [s.model_dump(by_alias=True, exclude_none=True)
                              for s in r.infer_edge_except],
        "extra_weights": [
            {"edge": {"source": e.edge.source, "target": e.edge.target,
                      **({"relation": e.edge.relation}
                         if isinstance(e.edge.relation, str) else {})},
             "vertex_weights": [w.to_dict(skip_defaults=False)
                                for w in e.vertex_weights]}
            for e in r.extra_weights],
    }


def proj_bindings(b):
    if b is None:
        return None
    d = b.to_dict(skip_defaults=False)
    rows = []
    for x in (d.get("resource_connector") or []):
        if isinstance(x, dict):
            rows.append({"resource": x.get("resource"),
                         "connector": x.get("connector")})
    return {"resource_connector": rows}


def proj_manifest(m):
    return {"resources": [proj_resource(r) for r in m.ingestion_model.resources],
            "bindings": proj_bindings(m.bindings)}


def dumps(x):
    return json.dumps(x, sort_keys=True, separators=(",", ":"), default=str)


def run_case(c):
    m = GraphManifest.from_config(yaml.safe_load(c["manifest"]))
    m.finish_init()
    for step in (c.get("inject") or []):
        for r in m.ingestion_model.resources:
            if r.name == "r":
                r.pipeline.append(step)
    before = dumps(proj_manifest(m))
    error = None
    after = None
    reach = None
    try:
        ops = TypeAdapter(list[ManifestOp]).validate_python(c["ops"])
        reach = ops_reaching_ingestion(ops)
        out = apply_evolution(m, ops)
        after = dumps(proj_manifest(out))
    except Exception as e:
        error = f"{type(e).__name__}: {e}"
    return {"name": c["name"], "manifest": c["manifest"], "ops": c["ops"],
            "before": before, "after": after, "reaching_ingestion": reach,
            "error": error}


def main():
    print(json.dumps([run_case(c) for c in CASES], indent=1, default=str))


if __name__ == "__main__":
    main()
