#!/usr/bin/env python3
"""Regenerates src/test/resources/reference_writer_fixture.json by EXECUTING
the reference's WRITER plane (DBWriter.write against the reference's own
graflo file backend, graflo/hq/db_writer.py) over corner-case
(manifest, batches) pairs — ground truth for ReferenceWriterParitySpec.

The actor fixture (gen_actor_fixture.py) stops at the assemble plane
(DocumentCaster.cast_batch); this one continues through the write plane:
drop-unkeyed stats + warning payloads (db_writer.py:206-238), blank-edge
zip-vs-join resolution (db_writer.py:314-349), extra-weight enrichment
(db_writer.py:355-387), blank/assigned/hash id fill, and cross-batch keyed
upsert merge, all executed against a real (file) backend and read back.

Two case shapes:
  * cast cases: each batch of docs runs through the reference's own
    DocumentCaster and then DBWriter.write — the end-to-end ingest path.
  * direct cases: GraphContainer built directly (the reference's
    migration/bulk entry shape) so the writer's own drop-unkeyed safety
    net fires (cast already prunes keyless docs, so only direct containers
    reach db_writer._drop_unkeyed_docs with droppable docs).

Recorded per case, all on the LOGICAL store plane:
  * vertices: per collection, the appended backend rows folded through the
    reference's own merge_doc_basis on the DB-aware identity fields — the
    keyed-upsert read plane (the file backend appends; every keyed backend
    merges last-wins per field).
  * edges: per (source, target, relation), the stored rows projected onto
    each endpoint's DB-aware identity fields, as a SET (backends differ in
    whether duplicate inserts are kept; the semantic content is which
    endpoint pairs exist with which props).
  * drops: structured (vertex, dropped, identity_fields) captured around
    the real _drop_unkeyed_docs, plus the formatted warning payloads.
  * error: non-null when the reference itself raised (executed truth —
    e.g. _enrich_extra_weights crashes on `weight.properties`,
    db_writer.py:378, whenever a valid vertex_weights entry is active).

Minted identities (blank uuid4 / assigned uuid4 / the writer's id mirror)
are not comparable across engines by value; every minted-mode collection is
declared in `minted` and both sides of the parity spec normalize those id
values to a content label (the row minus its minted id field) before
comparing. Fixture-side normalization happens here so the committed JSON is
deterministic across regenerations.

Usage:
  PYTHONPATH=/tmp/refstubs:/root/reference python3 tools/gen_writer_fixture.py \
      > src/test/resources/reference_writer_fixture.json

/tmp/refstubs must hold import stubs for the DB client libraries the
reference's connection registry imports at module scope (arango, psycopg2,
neo4j, falkordb, mgclient; see tools/refstubs_setup.sh) — none are ever
instantiated: every case runs on the file backend.
"""
import sys, json, asyncio, logging, tempfile, gzip, pathlib, re

sys.path.insert(0, '/tmp/refstubs'); sys.path.insert(0, '/root/reference')
import yaml
from graflo.architecture.contract.manifest import GraphManifest
from graflo.architecture.graph_types import GraphContainer
from graflo.architecture.graph_types.merge import merge_doc_basis
from graflo.hq.document_caster import DocumentCaster
from graflo.hq.ingestion_parameters import IngestionParams
from graflo.hq.db_writer import DBWriter
from graflo.connections.graflo_backend import GraFloBackendConfig
from graflo.db.manager import ConnectionManager
from graflo.onto import DBType

UUID_RE = re.compile(
    r'^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-'
    r'[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$')

CASES = []


def case(name, manifest_yaml, batches=None, direct=None, resource="r",
         graft_expectation="succeed"):
    """batches: list of doc-lists (all for `resource`), or list of
    {"resource": name, "docs": [...]} dicts for multi-resource sequences.
    graft_expectation: "succeed" (default — even where the reference
    crashes on its own bug) or "fail" (semantic errors both engines owe,
    e.g. endpoints_on_ambiguous: error)."""
    CASES.append({"name": name, "manifest": manifest_yaml,
                  "batches": batches, "direct": direct, "resource": resource,
                  "graft_expectation": graft_expectation})


# ----------------------------------------------------------------- schemas

# blank source, natural target, disjoint identity field names -> ZIP path
SCHEMA_ZIP = """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: note
                properties: [text]
                blank: true
            -   name: person
                properties: [pid]
                identity: [pid]
        edge_config:
            edges:
            -   source: note
                target: person
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   key: notes
            pipeline:
            -   vertex: note
        -   key: people
            pipeline:
            -   vertex: person
"""

# blank source carrying an `id` property, natural target with identity [id]
# -> the writer's JOIN path (shared identity field names)
SCHEMA_JOIN = """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: note
                properties: [text, id]
                blank: true
            -   name: person
                properties: [id, pname]
                identity: [id]
        edge_config:
            edges:
            -   source: note
                target: person
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   key: notes
            pipeline:
            -   vertex: note
        -   key: people
            pipeline:
            -   vertex: person
"""

SCHEMA_PERSON = """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid, alt, pname]
                identity: [pid]
        edge_config:
            edges: []
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: person
"""

SCHEMA_PERSON2 = SCHEMA_PERSON.replace("identity: [pid]", "identity: [pid, alt]")

SCHEMA_PC_EDGE = """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid]
                identity: [pid]
            -   name: city
                properties: [cid, pop]
                identity: [cid]
        edge_config:
            edges:
            -   source: person
                target: city
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: person
        -   key: home
            pipeline:
            -   vertex: city
        -   source: person
            target: city
"""

# ------------------------------------------------------------ zip corners

case("zip_equal_one_doc", SCHEMA_ZIP, batches=[[
    {"notes": [{"text": "n1"}, {"text": "n2"}],
     "people": [{"pid": "p1"}, {"pid": "p2"}]},
]])

# THE distinguishing case: batch-flat zip vs per-document zip.
# flat zip: (a1,P1), (a2,Q1), (b1,Q2); per-doc zip would give (a1,P1),(b1,Q1)
case("zip_batch_flat", SCHEMA_ZIP, batches=[[
    {"notes": [{"text": "a1"}, {"text": "a2"}], "people": [{"pid": "P1"}]},
    {"notes": [{"text": "b1"}], "people": [{"pid": "Q1"}, {"pid": "Q2"}]},
]])

case("zip_source_longer", SCHEMA_ZIP, batches=[[
    {"notes": [{"text": "n1"}, {"text": "n2"}, {"text": "n3"}],
     "people": [{"pid": "p1"}, {"pid": "p2"}]},
]])

case("zip_target_longer", SCHEMA_ZIP, batches=[[
    {"notes": [{"text": "n1"}],
     "people": [{"pid": "p1"}, {"pid": "p2"}, {"pid": "p3"}]},
]])

# target collection never emitted -> resolution skipped entirely
case("zip_no_target_emitted", SCHEMA_ZIP, batches=[[
    {"notes": [{"text": "n1"}, {"text": "n2"}], "people": []},
]])

# blank vertex as the TARGET side
case("zip_blank_target", """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid]
                identity: [pid]
            -   name: note
                properties: [text]
                blank: true
        edge_config:
            edges:
            -   source: person
                target: note
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   key: people
            pipeline:
            -   vertex: person
        -   key: notes
            pipeline:
            -   vertex: note
""", batches=[[
    {"people": [{"pid": "p1"}, {"pid": "p2"}],
     "notes": [{"text": "n1"}, {"text": "n2"}]},
]])

# both endpoints blank: both DB-aware identities are ['id'] so the writer
# selects the JOIN path (shared field names) — and two independent mints
# never collide, so NO edges resolve (executed truth; a per-position zip
# intuition would pair n1-t1, n2-t2)
case("zip_two_blank", """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: note
                properties: [text]
                blank: true
            -   name: tag
                properties: [label]
                blank: true
        edge_config:
            edges:
            -   source: note
                target: tag
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   key: notes
            pipeline:
            -   vertex: note
        -   key: tags
            pipeline:
            -   vertex: tag
""", batches=[[
    {"notes": [{"text": "n1"}, {"text": "n2"}],
     "tags": [{"label": "t1"}, {"label": "t2"}]},
]])

# zip accumulates across batches? each write call resolves ITS batch only
case("zip_two_batches", SCHEMA_ZIP, batches=[
    [{"notes": [{"text": "n1"}], "people": [{"pid": "p1"}]}],
    [{"notes": [{"text": "n2"}], "people": [{"pid": "p2"}]}],
])

# empty SOURCE list: blank vertex never emitted -> resolution skipped
case("zip_no_source_emitted", SCHEMA_ZIP, batches=[[
    {"notes": [], "people": [{"pid": "p1"}]},
]])

# flat zip across three docs of uneven lengths
case("zip_uneven_multi_doc", SCHEMA_ZIP, batches=[[
    {"notes": [{"text": "a1"}], "people": []},
    {"notes": [{"text": "b1"}, {"text": "b2"}, {"text": "b3"}],
     "people": [{"pid": "P1"}, {"pid": "P2"}]},
    {"notes": [], "people": [{"pid": "Q1"}]},
]])

# an EXPLICIT edge actor between the same endpoints: emits nothing at
# assemble (id-less blank source) and the writer zip still EXTENDS the
# (empty) rendered list — explicit declaration does not suppress resolution
case("zip_extends_explicit", """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: note
                properties: [text]
                blank: true
            -   name: person
                properties: [pid]
                identity: [pid]
        edge_config:
            edges:
            -   source: note
                target: person
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: note
        -   key: people
            pipeline:
            -   vertex: person
        -   source: note
            target: person
""", batches=[[
    {"text": "n1", "people": [{"pid": "p1"}, {"pid": "p2"}]},
    {"text": "n2", "people": [{"pid": "p3"}]},
]])

# relation-bearing schema edge: resolution rows land under that relation
case("zip_with_relation", """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: note
                properties: [text]
                blank: true
            -   name: person
                properties: [pid]
                identity: [pid]
        edge_config:
            edges:
            -   source: note
                target: person
                relation: mentions
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   key: notes
            pipeline:
            -   vertex: note
        -   key: people
            pipeline:
            -   vertex: person
""", batches=[[
    {"notes": [{"text": "n1"}], "people": [{"pid": "p1"}]},
]])

# ----------------------------------------------------------- join corners

# a1 (id X) fans out to BOTH X persons; a2 minted -> no join match;
# assemble inference contributes the (X, Y) product row
case("join_fanout_and_mint", SCHEMA_JOIN, batches=[[
    {"notes": [{"text": "a1", "id": "X"}, {"text": "a2"}],
     "people": [{"id": "X", "pname": "Ann"}, {"id": "X", "pname": "Axx"},
                {"id": "Y", "pname": "Bob"}]},
]])

# no note carries an id -> join path selected (shared field names) but
# every source key is a fresh mint -> zero resolution edges
case("join_all_minted", SCHEMA_JOIN, batches=[[
    {"notes": [{"text": "a1"}, {"text": "a2"}],
     "people": [{"id": "X", "pname": "Ann"}]},
]])

# one id-less note (mint -> no match) beside a matching one; an unmatched
# person keeps its vertex but gains no edge. NOTE: an EXPLICIT `id: null`
# is deliberately not a case — the reference's assemble plane reads Python
# key PRESENCE (a present-but-None id still emits an assemble edge row with
# src {id: None}) which has no tabular representation; graft reads null as
# absent (DIVERGENCES.md).
case("join_partial_ids", SCHEMA_JOIN, batches=[[
    {"notes": [{"text": "a1"}, {"text": "a2", "id": "Y"}],
     "people": [{"id": "Y", "pname": "Bob"}, {"id": "Z", "pname": "Cat"}]},
]])

# join path across two input docs (resolution is batch-level)
case("join_cross_doc", SCHEMA_JOIN, batches=[[
    {"notes": [{"text": "a1", "id": "X"}], "people": [{"id": "Y", "pname": "B"}]},
    {"notes": [{"text": "b1", "id": "Y"}], "people": [{"id": "X", "pname": "A"}]},
]])

# natural vertex as SOURCE, blank as TARGET sharing the `id` name -> join
# path with the roles reversed
case("join_blank_target", """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [id, pname]
                identity: [id]
            -   name: note
                properties: [text, id]
                blank: true
        edge_config:
            edges:
            -   source: person
                target: note
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   key: people
            pipeline:
            -   vertex: person
        -   key: notes
            pipeline:
            -   vertex: note
""", batches=[[
    {"people": [{"id": "X", "pname": "Ann"}],
     "notes": [{"text": "a1", "id": "X"}, {"text": "a2"}]},
]])

# batch 2 introduces a column batch 1 never carried (store-side schema
# widening under keyed merge)
case("upsert_new_fields_batch2", """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid, a, b]
                identity: [pid]
        edge_config:
            edges: []
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: person
""", batches=[
    [{"pid": "p1", "a": 1}],
    [{"pid": "p1", "b": 7}, {"pid": "p2", "b": 8}],
])

# --------------------------------------------- direct-container drop plane

case("drop_all_unkeyed", SCHEMA_PERSON, direct=[
    {"vertices": {"person": [{"pname": "a"}, {"pname": "b"}]}, "edges": []},
])

case("drop_mixed", SCHEMA_PERSON, direct=[
    {"vertices": {"person": [
        {"pid": "p1", "pname": "a"}, {"pname": "x"},
        {"pid": "p2", "pname": "b"}, {"pname": "y"}, {"pid": "p3"}]},
     "edges": []},
])

# two-field identity: any one present keeps the doc
case("drop_two_field_partial", SCHEMA_PERSON2, direct=[
    {"vertices": {"person": [
        {"pid": "p1", "pname": "full", "alt": "a1"},
        {"alt": "a2", "pname": "altonly"},
        {"pname": "none"}]},
     "edges": []},
])

# explicit nulls count as absent (doc.get(field) is None)
case("drop_explicit_nulls", SCHEMA_PERSON, direct=[
    {"vertices": {"person": [
        {"pid": None, "pname": "nulled"}, {"pid": "p1", "pname": "ok"}]},
     "edges": []},
])

# empty string is NOT None: the writer plane KEEPS it (unlike the cast
# plane, which prunes blank-string identities before the writer ever runs)
case("drop_empty_string_kept", SCHEMA_PERSON, direct=[
    {"vertices": {"person": [
        {"pid": "", "pname": "emptykey"}, {"pid": "p1", "pname": "ok"}]},
     "edges": []},
])

# drops in two collections -> one warning per collection
case("drop_two_collections", """
schema:
    metadata: {name: t}
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
            edges: []
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: person
""", direct=[
    {"vertices": {"person": [{"pname": "a"}, {"pid": "p1"}],
                  "city": [{"pop": 1}, {"pop": 2}, {"cid": "c1"}]},
     "edges": []},
])

# direct edge write-through with props; duplicate rows collapse on the
# set plane (backends differ: append vs dedup)
case("direct_edges_props", SCHEMA_PC_EDGE, direct=[
    {"vertices": {"person": [{"pid": "p1"}], "city": [{"cid": "c1"}]},
     "edges": [{"source": "person", "target": "city", "relation": None,
                "rows": [
                    [{"pid": "p1"}, {"cid": "c1"}, {"w": 2}],
                    [{"pid": "p1"}, {"cid": "c1"}, {"w": 2}]]}]},
])

# unkeyed docs drop BEFORE upsert but the container's edges still write
# (the reference drops only from the vertex write, not from gc)
case("drop_keeps_edges", SCHEMA_PC_EDGE, direct=[
    {"vertices": {"person": [{"pname": "nokey"}], "city": [{"cid": "c1"}]},
     "edges": [{"source": "person", "target": "city", "relation": None,
                "rows": [[{"pid": "ghost"}, {"cid": "c1"}, {}]]}]},
])

# drops across TWO direct writes: one warning per write call, stats add up
case("drop_direct_second_write", SCHEMA_PERSON, direct=[
    {"vertices": {"person": [{"pname": "w1a"}, {"pid": "p1"}]}, "edges": []},
    {"vertices": {"person": [{"pname": "w2a"}, {"pname": "w2b"},
                             {"pid": "p2"}]}, "edges": []},
])

# ------------------------------------------------------- cross-batch merge

case("upsert_last_wins_fields", """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid, a, b]
                identity: [pid]
        edge_config:
            edges: []
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: person
""", batches=[
    [{"pid": "p1", "a": 1, "b": 1}, {"pid": "p2", "a": 9}],
    [{"pid": "p1", "a": 2}],
])

# same identity twice in ONE batch: in-batch doc order last-wins
case("upsert_in_batch_dup", """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid, a, b]
                identity: [pid]
        edge_config:
            edges: []
ingestion_model:
    resources:
    -   name: r
        pipeline:
        -   vertex: person
""", batches=[
    [{"pid": "p1", "a": 1, "b": 1}, {"pid": "p1", "a": 2}],
])

# multi-field natural identity: the key is the TUPLE
case("upsert_compound_identity", SCHEMA_PERSON2, batches=[
    [{"pid": "p1", "alt": "x", "pname": "ax"},
     {"pid": "p1", "alt": "y", "pname": "ay"}],
    [{"pid": "p1", "alt": "x", "pname": "bx"}],
])

# edge inserted identically in two batches -> still one logical edge
case("edge_insert_two_batches", SCHEMA_PC_EDGE, batches=[
    [{"pid": "p1", "home": [{"cid": "c1", "pop": 10}]}],
    [{"pid": "p1", "home": [{"cid": "c1"}]}],
])

# ------------------------------------------------------- extra weights

# invalid vertex name in vertex_weights: logged error, write continues
case("xw_invalid_vertex", """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid]
                identity: [pid]
            -   name: city
                properties: [cid, pop]
                identity: [cid]
        edge_config:
            edges:
            -   source: person
                target: city
ingestion_model:
    resources:
    -   name: r
        extra_weights:
        -   source: person
            target: city
            vertex_weights:
            -   name: nosuchvertex
                fields: [pop]
        pipeline:
        -   vertex: person
        -   key: home
            pipeline:
            -   vertex: city
        -   source: person
            target: city
""", batches=[[
    {"pid": "p1", "home": [{"cid": "c1", "pop": 10}]},
]])

# weight vertex valid but never emitted by the resource: skipped silently
case("xw_vertex_absent", """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid]
                identity: [pid]
            -   name: city
                properties: [cid, pop]
                identity: [cid]
            -   name: country
                properties: [code, gdp]
                identity: [code]
        edge_config:
            edges:
            -   source: person
                target: city
ingestion_model:
    resources:
    -   name: r
        extra_weights:
        -   source: person
            target: city
            vertex_weights:
            -   name: country
                fields: [gdp]
        pipeline:
        -   vertex: person
        -   key: home
            pipeline:
            -   vertex: city
        -   source: person
            target: city
""", batches=[[
    {"pid": "p1", "home": [{"cid": "c1", "pop": 10}]},
]])

# ACTIVE vertex_weights entry: the reference's own DB-fetch enrichment
# crashes (db_writer.py:378 reads weight.properties; Weight declares
# `fields`, extra='forbid') — executed truth recorded as an error.
case("xw_active_reference_crash", """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid]
                identity: [pid]
            -   name: city
                properties: [cid, pop]
                identity: [cid]
        edge_config:
            edges:
            -   source: person
                target: city
ingestion_model:
    resources:
    -   name: r
        extra_weights:
        -   source: person
            target: city
            vertex_weights:
            -   name: city
                fields: [pop]
        pipeline:
        -   vertex: person
        -   key: home
            pipeline:
            -   vertex: city
        -   source: person
            target: city
""", batches=[[
    {"pid": "p1", "home": [{"cid": "c1", "pop": 10}]},
]])

# entry WITHOUT vertex_weights: plain edge declaration, no DB round-trip,
# no crash — the common production shape
case("xw_edge_only_entry", """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: person
                properties: [pid]
                identity: [pid]
            -   name: city
                properties: [cid, pop]
                identity: [cid]
        edge_config:
            edges:
            -   source: person
                target: city
ingestion_model:
    resources:
    -   name: r
        extra_weights:
        -   source: person
            target: city
        pipeline:
        -   vertex: person
        -   key: home
            pipeline:
            -   vertex: city
        -   source: person
            target: city
""", batches=[[
    {"pid": "p1", "home": [{"cid": "c1", "pop": 10}]},
]])


# ----------------------------------------- endpoint resolution (writer)

# secondary-identity endpoint resolution runs in the WRITER against the
# post-upsert store (db_writer._resolve_endpoints -> resolve_edge_endpoints)
# — these corners exercise it across batches and under each ambiguity
# policy. `first` sorts candidates by str(primary identity) on both
# engines (endpoint_resolve.py _sorted_candidates; graft casts to string).
def SCHEMA_SEC2(policy):
    return """
schema:
    metadata: {name: t}
    graph:
        vertex_config:
            vertices:
            -   name: instrument
                properties: [sid, isin]
                identity: [sid]
                secondary_identities:
                -   name: by_isin
                    fields: [isin]
            -   name: issuer
                properties: [iid, lei]
                identity: [iid]
                secondary_identities:
                -   name: by_lei
                    fields: [lei]
        edge_config:
            edges:
            -   source: instrument
                target: issuer
                relation: issued_by
ingestion_model:
    endpoints_on_ambiguous: """ + policy + """
    resources:
    -   name: seed_i
        pipeline:
        -   vertex: instrument
    -   name: seed_j
        pipeline:
        -   vertex: issuer
    -   name: links
        pipeline:
        -   vertex: instrument
            lookup_only: true
        -   vertex: issuer
            lookup_only: true
        -   from: instrument
            to: issuer
            relation: issued_by
            source_match: by_isin
            target_match: by_lei
"""

# cross-batch: endpoints seeded in EARLIER writes; the link batch carries
# only secondary fields and resolution reads the stored collections
case("er_cross_batch", SCHEMA_SEC2("all"), batches=[
    {"resource": "seed_i", "docs": [
        {"sid": "S1", "isin": "US1"}, {"sid": "S2", "isin": "US2"}]},
    {"resource": "seed_j", "docs": [
        {"iid": "I1", "lei": "L1"}, {"iid": "I2", "lei": "L2"}]},
    {"resource": "links", "docs": [
        {"isin": "US1", "lei": "L2"}, {"isin": "US2", "lei": "L1"}]},
])

# a link whose secondary key matches NOTHING drops out of the edge write
case("er_missing_match", SCHEMA_SEC2("all"), batches=[
    {"resource": "seed_i", "docs": [{"sid": "S1", "isin": "US1"}]},
    {"resource": "seed_j", "docs": [{"iid": "I1", "lei": "L1"}]},
    {"resource": "links", "docs": [
        {"isin": "US1", "lei": "L1"}, {"isin": "NOPE", "lei": "L1"},
        {"isin": "US1", "lei": "GONE"}]},
])

# ambiguity fan-out: two issuers share the lei; policy all -> both edges
case("er_ambiguous_all", SCHEMA_SEC2("all"), batches=[
    {"resource": "seed_i", "docs": [{"sid": "S1", "isin": "US1"}]},
    {"resource": "seed_j", "docs": [
        {"iid": "I1", "lei": "L1"}, {"iid": "I2", "lei": "L1"}]},
    {"resource": "links", "docs": [{"isin": "US1", "lei": "L1"}]},
])

# policy first: one edge (insertion order aligned with primary order —
# see the section note)
case("er_ambiguous_first", SCHEMA_SEC2("first"), batches=[
    {"resource": "seed_i", "docs": [{"sid": "S1", "isin": "US1"}]},
    {"resource": "seed_j", "docs": [
        {"iid": "I1", "lei": "L1"}, {"iid": "I2", "lei": "L1"}]},
    {"resource": "links", "docs": [{"isin": "US1", "lei": "L1"}]},
])

# policy first with NUMERIC-LOOKING primary ids: the reference sorts
# candidates by str(primary) — "10" wins over "9" — and graft casts to
# string to match
case("er_first_numeric_order", SCHEMA_SEC2("first"), batches=[
    {"resource": "seed_i", "docs": [{"sid": "1", "isin": "US1"}]},
    {"resource": "seed_j", "docs": [
        {"iid": 9, "lei": "L1"}, {"iid": 10, "lei": "L1"}]},
    {"resource": "links", "docs": [{"isin": "US1", "lei": "L1"}]},
])

# policy skip: the ambiguous key contributes NO edge; an unambiguous one
# in the same batch still resolves
case("er_ambiguous_skip", SCHEMA_SEC2("skip"), batches=[
    {"resource": "seed_i", "docs": [
        {"sid": "S1", "isin": "US1"}, {"sid": "S2", "isin": "US2"}]},
    {"resource": "seed_j", "docs": [
        {"iid": "I1", "lei": "L1"}, {"iid": "I2", "lei": "L1"},
        {"iid": "I3", "lei": "L3"}]},
    {"resource": "links", "docs": [
        {"isin": "US1", "lei": "L1"}, {"isin": "US2", "lei": "L3"}]},
])

# policy error: an ambiguous key FAILS the write on both engines
case("er_ambiguous_error", SCHEMA_SEC2("error"), batches=[
    {"resource": "seed_i", "docs": [{"sid": "S1", "isin": "US1"}]},
    {"resource": "seed_j", "docs": [
        {"iid": "I1", "lei": "L1"}, {"iid": "I2", "lei": "L1"}]},
    {"resource": "links", "docs": [{"isin": "US1", "lei": "L1"}]},
], graft_expectation="fail")

# ----------------------------------------------------------------- runner


def canon_value(v):
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v == int(v):
        return str(int(v))
    return str(v)


def canon_row(d, drop=()):
    return {k: canon_value(v) for k, v in sorted(d.items())
            if v is not None and k not in drop}


def run_case(c):
    cfg = yaml.safe_load(c["manifest"])
    m = GraphManifest.from_config(cfg)
    m.finish_init()
    sch = m.require_schema()
    dba = sch.resolve_db_aware(DBType.GRAFLO_BACKEND)
    vc = dba.vertex_config

    vnames = [v["name"] for v in
              cfg["schema"]["graph"]["vertex_config"]["vertices"]]
    minted = {}
    for v in cfg["schema"]["graph"]["vertex_config"]["vertices"]:
        if v.get("blank"):
            minted[v["name"]] = vc.identity_fields(v["name"])[0] \
                if vc.identity_fields(v["name"]) else "id"
        elif v.get("assigned"):
            minted[v["name"]] = vc.identity_fields(v["name"])[0]

    warns, drops = [], []

    class Capture(logging.Handler):
        def emit(self, rec):
            if rec.name.startswith("graflo.hq"):
                warns.append((rec.levelname, rec.getMessage()))

    handler = Capture()
    root = logging.getLogger("graflo")
    root.addHandler(handler)
    root.setLevel(logging.WARNING)

    orig_drop = DBWriter._drop_unkeyed_docs

    def spy(self, vcol, data, conn_conf):
        out = orig_drop(self, vcol, data, conn_conf)
        if len(out) != len(data):
            drops.append({
                "vertex": vcol, "dropped": len(data) - len(out),
                "fields": list(vc.identity_fields(vcol))})
        return out

    DBWriter._drop_unkeyed_docs = spy
    error = None
    tmpd = tempfile.mkdtemp(prefix="wfix_")
    try:
        conf = GraFloBackendConfig(output_dir=pathlib.Path(tmpd))
        with ConnectionManager(connection_config=conf) as db:
            db.define_schema(sch)
        w = DBWriter(sch, m.require_ingestion_model())
        if c["batches"] is not None:
            caster = DocumentCaster(m.require_ingestion_model())
            for batch in c["batches"]:
                if isinstance(batch, dict):
                    rname, docs = batch["resource"], batch["docs"]
                else:
                    rname, docs = c["resource"], batch
                res = asyncio.run(caster.cast_batch(
                    list(docs), rname, params=IngestionParams()))
                asyncio.run(w.write(res.graph, conf, rname))
        else:
            for gc_spec in c["direct"]:
                edges = {}
                for e in gc_spec["edges"]:
                    key = (e["source"], e["target"], e["relation"])
                    edges[key] = [tuple(r) for r in e["rows"]]
                gc = GraphContainer(
                    vertices={k: [dict(d) for d in v]
                              for k, v in gc_spec["vertices"].items()},
                    edges=edges)
                asyncio.run(w.write(gc, conf, c["resource"]))
    except Exception as e:  # executed truth: the reference itself raised
        error = f"{type(e).__name__}: {e}"
    finally:
        DBWriter._drop_unkeyed_docs = orig_drop
        root.removeHandler(handler)

    # ---- read the store back (logical plane)
    out_vertices = {}
    label_maps = {}   # vcol -> id value -> content label
    root_dir = pathlib.Path(tmpd)
    for vname in vnames:
        rows = []
        for p in sorted(root_dir.glob(f"vertices/{vname}.*.jsonl.gz")):
            for line in gzip.open(p, "rt"):
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
        idf = list(vc.identity_fields(vname))
        merged = merge_doc_basis(rows, tuple(idf)) if idf else rows
        if vname in minted:
            mf = minted[vname]
            lm = {}
            for r in merged:
                if r.get(mf) is not None:
                    label = json.dumps(canon_row(r, drop=(mf, "id")),
                                       sort_keys=True)
                    lm[str(r[mf])] = label
            label_maps[vname] = lm
            rows_out = []
            for r in merged:
                mv = r.get(mf)
                drop = (mf,) if (mv is not None and
                                 UUID_RE.match(str(mv))) else ()
                rows_out.append(canon_row(r, drop=drop))
            out_vertices[vname] = sorted(
                rows_out, key=lambda d: json.dumps(d, sort_keys=True))
        else:
            out_vertices[vname] = sorted(
                (canon_row(r) for r in merged),
                key=lambda d: json.dumps(d, sort_keys=True))

    def endpoint(doc, vname):
        """Project a stored endpoint doc onto the comparison plane."""
        if vname in minted:
            mf = minted[vname]
            mv = doc.get(mf)
            label = label_maps.get(vname, {}).get(str(mv))
            if label is None:
                # endpoint doc carries enough content to label directly
                label = json.dumps(canon_row(doc, drop=(mf, "id")),
                                   sort_keys=True)
            return {"@label": label}
        idf = vc.identity_fields(vname)
        return {f: canon_value(doc.get(f)) for f in idf
                if doc.get(f) is not None}

    out_edges = []
    for p in sorted(root_dir.glob("edges/*.jsonl.gz")):
        stem = p.name.split(".")[0]
        from graflo.architecture.backend.layout import GraFloLayout
        src, tgt, rel = GraFloLayout.index_name_to_edge_key(stem)
        rows = set()
        for line in gzip.open(p, "rt"):
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            s, t = rec[0], rec[1]
            props = rec[2] if len(rec) > 2 and isinstance(rec[2], dict) else {}
            rows.add(json.dumps(
                {"src": endpoint(s, src), "dst": endpoint(t, tgt),
                 "props": canon_row(props)}, sort_keys=True))
        existing = next((g for g in out_edges
                         if (g["source"], g["target"], g["relation"])
                         == (src, tgt, rel)), None)
        if existing is None:
            out_edges.append({"source": src, "target": tgt, "relation": rel,
                              "rows": sorted(rows)})
        else:
            existing["rows"] = sorted(set(existing["rows"]) | rows)
    out_edges.sort(key=lambda e: (e["source"], e["target"], str(e["relation"])))

    return {
        "name": c["name"], "manifest": c["manifest"],
        "resource": c["resource"], "batches": c["batches"],
        "direct": c["direct"], "minted": minted,
        "store": {"vertices": out_vertices, "edges": out_edges},
        # aggregated per vertex across write calls (warnings keep per-call
        # granularity)
        "graft_expectation": c["graft_expectation"],
        "drops": sorted(
            ({"vertex": v,
              "dropped": sum(d["dropped"] for d in drops if d["vertex"] == v),
              "fields": next(d["fields"] for d in drops if d["vertex"] == v)}
             for v in {d["vertex"] for d in drops}),
            key=lambda d: d["vertex"]),
        # compared plane: the drop-unkeyed payloads (graft's WriteReport);
        # the resolver's stats-summary log lines are reference logging
        # chatter whose CONTENT the edge-set comparison already covers
        "warnings": sorted(m for lvl, m in warns
                           if lvl == "WARNING" and m.startswith("Skipped ")),
        "errors_logged": sorted(m for lvl, m in warns if lvl == "ERROR"),
        "error": error,
    }


def main():
    out = [run_case(c) for c in CASES]
    print(json.dumps(out, indent=1, default=str))


if __name__ == "__main__":
    main()
