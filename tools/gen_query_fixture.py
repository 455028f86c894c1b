#!/usr/bin/env python3
"""Regenerates src/test/resources/reference_query_fixture.json by EXECUTING
the reference's READ-QUERY plane — `bfs_neighbors` (graflo/db/traversal.py),
`Connection.traverse` (graflo/db/conn.py:791-830), and the file backend's
`fetch_docs` / `fetch_present_documents` / `keep_absent_documents`
(graflo/db/graflo_backend/connection.py) — over corner-case stores.
Ground truth for ReferenceQueryParitySpec.

The writer/actor/filter/digest/evolution fixtures pin the WRITE side; this
one pins the READ side: direction handling per edge orientation (including
the `_anchor_side` dialect, traversal.py:246-265 — OUT from a cross-type
edge's TARGET is served INBOUND, and IN never follows a directed cross-type
edge at all), anchor exclusion (the anchor doc is never in the result
container), dangling endpoints (edge rows kept, vertex absent, never
expanded), the global edge budget with its hop-boundary stop, multi-seed
traverse as merged per-seed walks (a seed reached from ANOTHER seed's walk
does appear), cycle termination, field-map vs raw-id anchors, and the
fetch/projection plane.

Executed against the reference's OWN file backend, with exactly two
defects in that backend's read path patched in a subclass (both are
demonstrated bugs of the file backend, not of the shared traversal plane —
every live backend disagrees with them by construction):

  1. `_edge_index` (connection.py:289-331) keys edges on
     `storage_name()`, which is Arango-only by construction
     (database_features.py:492-493 returns None for every other flavor),
     so the index is ALWAYS empty and file-backend traversal returns
     nothing. The subclass keys the index on `edge_query_name` — the very
     name `_fetch_edge_rows` (traversal.py:302) asks for.
  2. `fetch_edges` (connection.py:270-273) evaluates filters as
     `expression(row, kind=PYTHON)`, binding the row dict to the
     `doc_name` POSITIONAL parameter (filter/onto.py:271-276) so the
     row's values never reach the evaluator and every filtered fetch
     returns []. The subclass evaluates `expression(kind=PYTHON, **row)`
     — the call form the same file's `fetch_docs._keep` uses — and
     applies the filter BEFORE the limit (live backends push filters
     into the query, so their limit bounds the filtered result).

Everything else — bfs_neighbors, traverse, fetch_docs, present/absent —
is the reference's own code executing unmodified.

Usage:
  sh tools/refstubs_setup.sh   # once
  PYTHONPATH=/tmp/refstubs:/root/reference python3 tools/gen_query_fixture.py \
      > src/test/resources/reference_query_fixture.json
"""
import sys, json, pathlib, tempfile

sys.path.insert(0, '/tmp/refstubs'); sys.path.insert(0, '/root/reference')

from graflo.architecture.contract.manifest import GraphManifest
from graflo.architecture.graph_types import EdgeDirection
from graflo.connections.graflo_backend import GraFloBackendConfig
from graflo.db.graflo_backend.connection import GraFloBackendConnection
from graflo.db.traversal import edge_query_name
from graflo.db.graflo_backend.connection import _first_value
from graflo.filter.onto import parse_filter_expression
from graflo.onto import ExpressionFlavor


class TraversableFileConnection(GraFloBackendConnection):
    """File backend with its two read-path defects patched (see module doc)."""

    def _edge_index(self):
        if self._edge_index_cache is not None:
            return self._edge_index_cache
        self._sync_for_read()  # the index file only exists after a flush
        schema = self._reader.read_schema()
        db_aware = schema.resolve_db_aware(self.flavor)
        index = {}
        for edge in schema.core_schema.edge_config.edges:
            # defect 1 fix: name the bucket what _fetch_edge_rows will ask for
            storage = edge_query_name(db_aware, edge, self.flavor)
            if storage is None:
                continue
            rows = index.setdefault(storage, [])
            source_identity = db_aware.vertex_config.identity_fields(edge.source)
            target_identity = db_aware.vertex_config.identity_fields(edge.target)
            for batch in self._reader.iter_edge_batches(edge.edge_id):
                for record in batch:
                    if not isinstance(record, list) or len(record) < 2:
                        continue
                    source_doc, target_doc = record[0], record[1]
                    weight = record[2] if len(record) > 2 else {}
                    rows.append({
                        **(weight if isinstance(weight, dict) else {}),
                        "_from_key": _first_value(source_doc, source_identity),
                        "_to_key": _first_value(target_doc, target_identity),
                    })
        self._edge_index_cache = index
        return index

    def fetch_edges(self, from_type, from_id, edge_type=None, to_type=None,
                    to_id=None, filters=None, limit=None, return_keys=None,
                    unset_keys=None, direction=EdgeDirection.OUT, **kwargs):
        index = self._edge_index()
        entries = index.get(edge_type) if edge_type is not None else None
        if entries is None:
            entries = [row for rows in index.values() for row in rows]
        expression = parse_filter_expression(filters) if filters is not None else None
        matched = []
        for row in entries:
            source_id = row.get("_from_key")
            target_id = row.get("_to_key")
            if direction is EdgeDirection.OUT:
                anchored, far = source_id == from_id, target_id
            elif direction is EdgeDirection.IN:
                anchored, far = target_id == from_id, source_id
            else:
                if source_id == from_id:
                    anchored, far = True, target_id
                elif target_id == from_id:
                    anchored, far = True, source_id
                else:
                    anchored, far = False, None
            if not anchored:
                continue
            if to_id is not None and far != to_id:
                continue
            if expression is not None:
                # defect 2 fix: kwargs form (fetch_docs' _keep), filter
                # before limit
                try:
                    if not bool(expression(kind=ExpressionFlavor.PYTHON, **row)):
                        continue
                except Exception:
                    continue
            matched.append(row)
            if limit is not None and len(matched) >= limit:
                break
        if return_keys or unset_keys:
            keep = set(return_keys) if return_keys else None
            drop = set(unset_keys) if unset_keys else set()
            matched = [{k: v for k, v in row.items()
                        if (keep is None or k in keep) and k not in drop}
                       for row in matched]
        return matched


# --------------------------------------------------------------- stores

def manifest_yaml(schema):
    """Schema spec (the fixture's own compact JSON form) -> manifest dict."""
    return {
        "schema": {
            "metadata": {"name": "qfix"},
            "graph": {
                "vertex_config": {"vertices": [
                    {"name": v["name"], "properties": v["properties"],
                     "identity": v["identity"]} for v in schema["vertices"]]},
                "edge_config": {"edges": [
                    {k: e[k] for k in ("source", "target", "relation", "directed")
                     if k in e} for e in schema["edges"]]},
            },
        },
        "ingestion_model": {"resources": [
            {"name": "r", "pipeline": [{"vertex": schema["vertices"][0]["name"]}]}]},
    }


S_MAIN = {
    "vertices": [
        {"name": "person", "identity": ["pid"], "properties": ["pid", "pname", "n"]},
        {"name": "item", "identity": ["iid"], "properties": ["iid", "tag"]},
    ],
    "edges": [
        {"source": "person", "target": "person", "relation": "knows"},
        {"source": "person", "target": "item", "relation": "likes"},
        {"source": "item", "target": "item", "relation": "similar",
         "directed": False},
    ],
}

STORE_MAIN = {
    "schema": S_MAIN,
    "vertices": {
        "person": [
            {"pid": "A", "pname": "alpha", "n": 1},
            {"pid": "B", "pname": "beta", "n": 2},
            {"pid": "C", "pname": "gamma", "n": 3},
            {"pid": "D", "pname": "delta", "n": 4},
        ],
        "item": [
            {"iid": "i1", "tag": "red"},
            {"iid": "i2", "tag": "green"},
            {"iid": "i3", "tag": "blue"},
        ],
    },
    # A -> B -> C -> D -> A cycle; likes into items; undirected item chain
    "edges": [
        {"source": "person", "target": "person", "relation": "knows", "rows": [
            [{"pid": "A"}, {"pid": "B"}, {"w": 1}],
            [{"pid": "B"}, {"pid": "C"}, {"w": 2}],
            [{"pid": "C"}, {"pid": "D"}, {"w": 3}],
            [{"pid": "D"}, {"pid": "A"}, {"w": 4}],
        ]},
        {"source": "person", "target": "item", "relation": "likes", "rows": [
            [{"pid": "A"}, {"iid": "i1"}, {"since": 2020}],
            [{"pid": "B"}, {"iid": "i2"}, {"since": 2021}],
            [{"pid": "C"}, {"iid": "i2"}, {"since": 2022}],
        ]},
        {"source": "item", "target": "item", "relation": "similar", "rows": [
            [{"iid": "i1"}, {"iid": "i2"}, {}],
            [{"iid": "i2"}, {"iid": "i3"}, {}],
        ]},
    ],
}

S_DANGLE = {
    "vertices": [
        {"name": "person", "identity": ["pid"], "properties": ["pid"]},
    ],
    "edges": [
        {"source": "person", "target": "person", "relation": "knows"},
    ],
}

# X and its outgoing edge exist only on the edge plane — X was never stored
STORE_DANGLE = {
    "schema": S_DANGLE,
    "vertices": {"person": [{"pid": "A"}, {"pid": "B"}, {"pid": "Z"}]},
    "edges": [
        {"source": "person", "target": "person", "relation": "knows", "rows": [
            [{"pid": "A"}, {"pid": "B"}, {}],
            [{"pid": "A"}, {"pid": "X"}, {}],
            [{"pid": "X"}, {"pid": "Z"}, {}],
        ]},
    ],
}

STORES = {"main": STORE_MAIN, "dangle": STORE_DANGLE}

# ---------------------------------------------------------------- cases

CASES = []


def case(name, store, op, note="", compare="exact", graft_expectation="succeed"):
    CASES.append({"name": name, "store": store, "op": op, "note": note,
                  "compare": compare, "graft_expectation": graft_expectation})


F = lambda field, op, value=None: (
    {"field": field, "cmp_operator": op}
    if value is None else {"field": field, "cmp_operator": op, "value": value})

# --- direction matrix (hops=1), every (edge orientation × direction) cell
case("nb_self_out", "main",
     {"kind": "neighbors", "vertex": "person", "key": "B", "hops": 1,
      "direction": "out", "edge_types": ["knows"]},
     note="directed self-type edge, OUT: follows declaration order only")
case("nb_self_in", "main",
     {"kind": "neighbors", "vertex": "person", "key": "B", "hops": 1,
      "direction": "in", "edge_types": ["knows"]})
case("nb_self_any", "main",
     {"kind": "neighbors", "vertex": "person", "key": "B", "hops": 1,
      "direction": "any", "edge_types": ["knows"]})
case("nb_bi_src_out", "main",
     {"kind": "neighbors", "vertex": "person", "key": "B", "hops": 1,
      "direction": "out", "edge_types": ["likes"]})
case("nb_bi_src_in", "main",
     {"kind": "neighbors", "vertex": "person", "key": "B", "hops": 1,
      "direction": "in", "edge_types": ["likes"]},
     note="IN on a directed cross-type edge is unreachable "
          "(_anchor_side returns None on both sides, traversal.py:246-265)")
case("nb_bi_tgt_out", "main",
     {"kind": "neighbors", "vertex": "item", "key": "i2", "hops": 1,
      "direction": "out", "edge_types": ["likes"]},
     note="THE dialect case: OUT anchored at the edge's TARGET is served "
          "INBOUND (traversal.py:249-253 'queried inbound even when the "
          "caller asked to go out') — OUT on cross-type edges is two-way")
case("nb_bi_tgt_in", "main",
     {"kind": "neighbors", "vertex": "item", "key": "i2", "hops": 1,
      "direction": "in", "edge_types": ["likes"]})
case("nb_bi_tgt_any", "main",
     {"kind": "neighbors", "vertex": "item", "key": "i2", "hops": 1,
      "direction": "any", "edge_types": ["likes"]})
case("nb_undir_out", "main",
     {"kind": "neighbors", "vertex": "item", "key": "i2", "hops": 1,
      "direction": "out", "edge_types": ["similar"]},
     note="undirected edges are bidirectional whatever the caller asked")
case("nb_undir_in", "main",
     {"kind": "neighbors", "vertex": "item", "key": "i2", "hops": 1,
      "direction": "in", "edge_types": ["similar"]})
case("nb_undir_any", "main",
     {"kind": "neighbors", "vertex": "item", "key": "i2", "hops": 1,
      "direction": "any", "edge_types": ["similar"]})
case("nb_all_edges_any", "main",
     {"kind": "neighbors", "vertex": "person", "key": "B", "hops": 1,
      "direction": "any"})

# --- hops, cycles, anchor handling
case("nb_2hop_out", "main",
     {"kind": "neighbors", "vertex": "person", "key": "A", "hops": 2,
      "direction": "out", "edge_types": ["knows"]})
case("nb_cycle_terminates", "main",
     {"kind": "neighbors", "vertex": "person", "key": "A", "hops": 6,
      "direction": "out", "edge_types": ["knows"]},
     note="the cycle edge D->A is collected but A is never re-added: the "
          "anchor is NOT part of the result container")
case("nb_2hop_via_item", "main",
     {"kind": "neighbors", "vertex": "person", "key": "A", "hops": 2,
      "direction": "out", "edge_types": ["likes"]},
     note="hop 2 re-reads the same likes row from i1's side; the row marker "
          "dedups it and the walk ends")
case("nb_anchor_fieldmap", "main",
     {"kind": "neighbors", "vertex": "person", "key": {"pname": "beta"},
      "hops": 1, "direction": "out", "edge_types": ["knows"]})
case("nb_anchor_fieldmap_missing", "main",
     {"kind": "neighbors", "vertex": "person", "key": {"pname": "nope"},
      "hops": 1, "direction": "any"})
case("nb_anchor_str_missing", "main",
     {"kind": "neighbors", "vertex": "person", "key": "Q", "hops": 1,
      "direction": "any"},
     note="a raw-id anchor is trusted without lookup; no incident edges -> "
          "empty")
case("nb_anchor_dangling_id", "dangle",
     {"kind": "neighbors", "vertex": "person", "key": "X", "hops": 1,
      "direction": "out"},
     note="a raw-id anchor need not exist as a stored vertex: X's outgoing "
          "edge is followed and Z hydrates")

# --- dangling endpoints
case("nb_dangling_edge_kept", "dangle",
     {"kind": "neighbors", "vertex": "person", "key": "A", "hops": 1,
      "direction": "out"},
     note="the A->X edge row IS in the container; X (never stored) is not")
case("nb_dangling_not_expanded", "dangle",
     {"kind": "neighbors", "vertex": "person", "key": "A", "hops": 2,
      "direction": "out"},
     note="X fails hydration so it never enters the frontier: X->Z is NOT "
          "collected at hop 2")

# --- global edge budget (single edge per hop -> deterministic everywhere)
case("nb_limit_1", "main",
     {"kind": "neighbors", "vertex": "person", "key": "A", "hops": 3,
      "direction": "out", "edge_types": ["knows"], "limit": 1},
     note="budget exhausts at the hop-1 boundary: only A->B")
case("nb_limit_2", "main",
     {"kind": "neighbors", "vertex": "person", "key": "A", "hops": 3,
      "direction": "out", "edge_types": ["knows"], "limit": 2})
case("nb_limit_3", "main",
     {"kind": "neighbors", "vertex": "person", "key": "A", "hops": 3,
      "direction": "out", "edge_types": ["knows"], "limit": 3})
case("nb_limit_fanout_counts", "main",
     {"kind": "neighbors", "vertex": "person", "key": "B", "hops": 1,
      "direction": "any", "limit": 2},
     compare="counts",
     note="mid-fan-out truncation keeps a backend-order-dependent subset; "
          "only the SIZES are the cross-engine contract")

# --- edge filters (constrain traversal, evaluated on edge rows)
case("nb_edge_filter_gt", "main",
     {"kind": "neighbors", "vertex": "person", "key": "B", "hops": 1,
      "direction": "any", "edge_types": ["knows"],
      "filter": F("w", ">", 1)},
     note="A->B (w=1) is filtered out; only B->C (w=2) traverses")
case("nb_edge_filter_missing_field", "main",
     {"kind": "neighbors", "vertex": "person", "key": "B", "hops": 1,
      "direction": "any", "filter": F("w", ">", 1)},
     note="the likes row lacks w entirely -> does not match; filters apply "
          "to every traversed edge type")
case("nb_edge_filter_is_null", "main",
     {"kind": "neighbors", "vertex": "person", "key": "B", "hops": 1,
      "direction": "any", "filter": F("w", "IS_NULL")},
     note="IS_NULL matches rows MISSING the field: only the likes row")

# --- error contracts
case("nb_unknown_vertex_type", "main",
     {"kind": "neighbors", "vertex": "nope", "key": "A", "hops": 1,
      "direction": "any"},
     graft_expectation="fail")
case("nb_zero_hops", "main",
     {"kind": "neighbors", "vertex": "person", "key": "A", "hops": 0,
      "direction": "any"},
     graft_expectation="fail")

# --- multi-seed traverse (merged per-seed walks)
case("tr_merge_dedup", "main",
     {"kind": "traverse", "seeds": [
         {"vertex_type": "person", "key": "A"},
         {"vertex_type": "person", "key": "C"}],
      "max_hops": 1, "direction": "any", "edge_relations": ["knows"]},
     note="B and D are each reached from both seeds and appear once")
case("tr_seed_reached_from_other", "main",
     {"kind": "traverse", "seeds": [
         {"vertex_type": "person", "key": "A"},
         {"vertex_type": "person", "key": "B"}],
      "max_hops": 1, "direction": "out", "edge_relations": ["knows"]},
     note="each walk excludes its OWN anchor, but B is reached from A's "
          "walk (and A from B's at hops>=3) — so both seeds' docs appear")
case("tr_same_seed_twice", "main",
     {"kind": "traverse", "seeds": [
         {"vertex_type": "person", "key": "A"},
         {"vertex_type": "person", "key": "A"}],
      "max_hops": 1, "direction": "out", "edge_relations": ["knows"]})
case("tr_per_seed_limit", "main",
     {"kind": "traverse", "seeds": [
         {"vertex_type": "person", "key": "A"},
         {"vertex_type": "person", "key": "C"}],
      "max_hops": 2, "direction": "out", "edge_relations": ["knows"],
      "limit": 1},
     note="the edge budget is PER SEED (conn.py:815 passes query.limit to "
          "each walk): one edge from A's walk and one from C's")
case("tr_missing_seed", "main",
     {"kind": "traverse", "seeds": [
         {"vertex_type": "person", "key": "A"},
         {"vertex_type": "person", "key": "Q"}],
      "max_hops": 1, "direction": "out", "edge_relations": ["knows"]})
case("tr_mixed_types", "main",
     {"kind": "traverse", "seeds": [
         {"vertex_type": "person", "key": "A"},
         {"vertex_type": "item", "key": "i3"}],
      "max_hops": 1, "direction": "any"})

# --- fetch_docs plane
case("fd_all", "main", {"kind": "fetch_docs", "class": "person"})
case("fd_filter_eq", "main",
     {"kind": "fetch_docs", "class": "person",
      "filter": F("pname", "==", "beta")})
case("fd_filter_composite", "main",
     {"kind": "fetch_docs", "class": "person",
      "filter": {"AND": [
          {"OR": [F("pname", "==", "beta"), F("pname", "==", "gamma")]},
          F("pid", "!=", "C")]}})
case("fd_filter_not", "main",
     {"kind": "fetch_docs", "class": "person",
      "filter": {"NOT": [F("n", ">", 2)]}})
case("fd_missing_field_no_match", "main",
     {"kind": "fetch_docs", "class": "item",
      "filter": F("pname", "==", "beta")},
     note="a document missing a filtered field simply does not match "
          "(connection.py:196-201)")
case("fd_python_strict_eq", "main",
     {"kind": "fetch_docs", "class": "person",
      "filter": F("n", "==", "2")},
     note="PYTHON flavor never coerces: int 2 == str '2' is False")
case("fd_return_keys", "main",
     {"kind": "fetch_docs", "class": "person",
      "filter": F("pid", "==", "A"), "return_keys": ["pid", "nope"]},
     note="projection uses doc.get: a missing key projects to null")
case("fd_unset_keys", "main",
     {"kind": "fetch_docs", "class": "person",
      "filter": F("pid", "==", "A"), "unset_keys": ["pname"]})
case("fd_limit_after_filter", "main",
     {"kind": "fetch_docs", "class": "person",
      "filter": F("pname", "!=", "alpha"), "limit": 2},
     note="limit bounds the FILTERED result (connection.py:210); insertion "
          "order here coincides with identity order so the subset is stable")

# --- presence joins
case("fp_flat", "main",
     {"kind": "fetch_present", "class": "person",
      "batch": [{"pid": "A"}, {"pid": "Q"}, {"pid": "C"}],
      "match_keys": ["pid"], "flatten": True})
case("fp_grouped", "main",
     {"kind": "fetch_present", "class": "person",
      "batch": [{"pid": "Q"}, {"pid": "B"}], "match_keys": ["pid"],
      "flatten": False},
     note="grouped form keys matches by BATCH INDEX")
case("fp_no_match_keys", "main",
     {"kind": "fetch_present", "class": "person",
      "batch": [{"pid": "A"}], "match_keys": [], "flatten": True})
case("ka_absent", "main",
     {"kind": "keep_absent", "class": "person",
      "batch": [{"pid": "A"}, {"pid": "Q"}, {"pid": "B"}, {"pid": "R"}],
      "match_keys": ["pid"]})
case("ka_no_match_keys", "main",
     {"kind": "keep_absent", "class": "person",
      "batch": [{"pid": "A"}], "match_keys": []},
     note="no match keys -> the whole batch is 'absent'")


# ------------------------------------------------------------- executor

def canon_edge_row(row):
    out = {k: v for k, v in row.items()
           if k not in ("_from_key", "_to_key")}
    return out


def container_result(gc):
    vertices = {}
    for vtype, docs in gc.vertices.items():
        if docs:
            vertices[vtype] = sorted(
                docs, key=lambda d: json.dumps(d, sort_keys=True))
    edges = {}
    for edge_id, rows in gc.edges.items():
        if rows:
            key = "|".join(str(x) for x in edge_id)
            edges[key] = sorted(
                (canon_edge_row(r) for r in rows),
                key=lambda d: json.dumps(d, sort_keys=True))
    return {"vertices": vertices, "edges": edges}


def counts_result(gc):
    return {
        "vertex_counts": {t: len(d) for t, d in gc.vertices.items() if d},
        "edge_count": sum(len(r) for r in gc.edges.values()),
    }


def open_store(spec):
    m = GraphManifest.from_config(manifest_yaml(spec["schema"]))
    m.finish_init()
    sch = m.require_schema()
    tmpd = tempfile.mkdtemp(prefix="qfix_")
    conn = TraversableFileConnection(
        GraFloBackendConfig(output_dir=pathlib.Path(tmpd)))
    conn.define_schema(sch)
    for vtype, docs in spec["vertices"].items():
        conn.upsert_docs_batch([dict(d) for d in docs], vtype, ["_"])
    for e in spec["edges"]:
        conn.insert_edges_batch(
            [[dict(r[0]), dict(r[1]), dict(r[2])] for r in e["rows"]],
            e["source"], e["target"], e["relation"], (), ())
    return conn, sch


def run_case(c):
    conn, sch = open_store(STORES[c["store"]])
    op = c["op"]
    error, result = None, None
    try:
        if op["kind"] == "neighbors":
            gc = conn.graph_neighbors(
                op["vertex"], op["key"], hops=op.get("hops", 1),
                direction=EdgeDirection(op.get("direction", "out")),
                edge_types=op.get("edge_types"),
                filters=(parse_filter_expression(op["filter"])
                         if op.get("filter") else None),
                limit=op.get("limit"), schema=sch)
            result = (counts_result(gc) if c["compare"] == "counts"
                      else container_result(gc))
        elif op["kind"] == "traverse":
            from graflo.architecture.query import TraverseQuery
            q = TraverseQuery(
                seeds=op["seeds"], max_hops=op["max_hops"],
                direction=EdgeDirection(op.get("direction", "any")),
                edge_relations=op.get("edge_relations"),
                **({"limit": op["limit"]} if op.get("limit") else {}),
            ).finish_init()
            gc = conn.traverse(q, schema=sch)
            result = (counts_result(gc) if c["compare"] == "counts"
                      else container_result(gc))
        elif op["kind"] == "fetch_docs":
            docs = conn.fetch_docs(
                op["class"],
                filters=op.get("filter"), limit=op.get("limit"),
                return_keys=op.get("return_keys"),
                unset_keys=op.get("unset_keys"))
            result = {"docs": sorted(
                docs, key=lambda d: json.dumps(d, sort_keys=True))}
        elif op["kind"] == "fetch_present":
            out = conn.fetch_present_documents(
                [dict(d) for d in op["batch"]], op["class"],
                op["match_keys"], flatten=op["flatten"])
            if op["flatten"]:
                result = {"present_flat": out}
            else:
                result = {"present_grouped": {str(k): v for k, v in out.items()}}
        elif op["kind"] == "keep_absent":
            out = conn.keep_absent_documents(
                [dict(d) for d in op["batch"]], op["class"], op["match_keys"])
            result = {"absent": out}
        else:
            raise AssertionError(op["kind"])
    except Exception as e:
        error = f"{type(e).__name__}: {e}"
    return {**c, "result": result, "error": error}


def main():
    out = {
        "_generator": "tools/gen_query_fixture.py (reads module docstring)",
        "stores": {
            name: {"schema": spec["schema"], "vertices": spec["vertices"],
                   "edges": spec["edges"]}
            for name, spec in STORES.items()},
        "cases": [run_case(c) for c in CASES],
    }
    json.dump(out, sys.stdout, indent=1, sort_keys=True)
    sys.stdout.write("\n")


if __name__ == "__main__":
    main()
