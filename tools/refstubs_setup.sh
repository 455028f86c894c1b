#!/bin/sh
# Import stubs for the DB client libraries the reference's connection
# registry imports at module scope. None are ever instantiated: every
# fixture case runs on the reference's file backend. Run once before
# gen_writer_fixture.py / gen_actor_fixture.py:
#   sh tools/refstubs_setup.sh
set -e
mkdir -p /tmp/refstubs/arango /tmp/refstubs/psycopg2 /tmp/refstubs/neo4j /tmp/refstubs/falkordb
[ -f /tmp/refstubs/strenum.py ] || cat > /tmp/refstubs/strenum.py <<'PY'
import enum
class StrEnum(str, enum.Enum):
    def __str__(self): return str(self.value)
PY
cat > /tmp/refstubs/arango/__init__.py <<'PY'
class ArangoClient:
    def __init__(self, *a, **k): raise RuntimeError("arango stub")
PY
cat > /tmp/refstubs/arango/graph.py <<'PY'
class Graph:
    def __init__(self, *a, **k): raise RuntimeError("arango stub")
PY
cat > /tmp/refstubs/arango/exceptions.py <<'PY'
class CursorNextError(Exception): pass
class DocumentInsertError(Exception): pass
class DocumentUpdateError(Exception): pass
class ArangoServerError(Exception): pass
class GraphCreateError(Exception): pass
class CollectionCreateError(Exception): pass
PY
cat > /tmp/refstubs/arango/cursor.py <<'PY'
class Cursor: pass
PY
cat > /tmp/refstubs/arango/database.py <<'PY'
class StandardDatabase: pass
class Database: pass
PY
cat > /tmp/refstubs/arango/collection.py <<'PY'
class StandardCollection: pass
class Collection: pass
PY
cat > /tmp/refstubs/psycopg2/__init__.py <<'PY'
class Error(Exception): pass
def connect(*a, **k): raise RuntimeError("psycopg2 stub")
PY
cat > /tmp/refstubs/psycopg2/sql.py <<'PY'
class SQL:
    def __init__(self, s): self.s = s
    def format(self, *a, **k): return self
    def join(self, xs): return self
class Identifier:
    def __init__(self, *a): pass
class Literal:
    def __init__(self, *a): pass
class Placeholder:
    def __init__(self, *a): pass
class Composed:
    def __init__(self, *a): pass
PY
cat > /tmp/refstubs/psycopg2/extras.py <<'PY'
class RealDictCursor: pass
def execute_values(*a, **k): raise RuntimeError("psycopg2 stub")
PY
cat > /tmp/refstubs/neo4j/__init__.py <<'PY'
class GraphDatabase:
    @staticmethod
    def driver(*a, **k): raise RuntimeError("neo4j stub")
PY
cat > /tmp/refstubs/neo4j/exceptions.py <<'PY'
class ClientError(Exception): pass
PY
cat > /tmp/refstubs/falkordb/__init__.py <<'PY'
class FalkorDB:
    def __init__(self, *a, **k): raise RuntimeError("falkordb stub")
PY
cat > /tmp/refstubs/falkordb/graph.py <<'PY'
class Graph:
    def __init__(self, *a, **k): raise RuntimeError("falkordb stub")
PY
cat > /tmp/refstubs/mgclient.py <<'PY'
def connect(*a, **k): raise RuntimeError("mgclient stub")
PY
echo "refstubs ready at /tmp/refstubs"
