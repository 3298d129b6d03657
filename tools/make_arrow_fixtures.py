#!/usr/bin/env python3
"""Generate Arrow IPC interchange fixtures that exercise what real-world
files contain and the JVM-side writer does not produce: dictionary-encoded
columns and lz4/zstd-compressed record batches. Run once; outputs are
committed under src/test/resources/arrow/ and pinned by ArrowIoSpec.

The table is deterministic (no RNG): 60 rows across 3 record batches so the
dictionary + compression framing appears per batch.
"""
import os
import pyarrow as pa
import pyarrow.ipc as ipc

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "arrow")
os.makedirs(OUT, exist_ok=True)

n = 60
cat = pa.array([["alpha", "beta", "gamma", None][i % 4] for i in range(n)]
               ).dictionary_encode()
ids = pa.array(range(n), type=pa.int64())
val = pa.array([i * 0.5 for i in range(n)], type=pa.float64())
table = pa.table({"id": ids, "cat": cat, "val": val})

batches = table.to_batches(max_chunksize=20)
schema = table.schema


def write(path, fmt, codec):
    opts = ipc.IpcWriteOptions(compression=codec)
    if fmt == "stream":
        w = ipc.new_stream(path, schema, options=opts)
    else:
        w = ipc.new_file(path, schema, options=opts)
    for b in batches:
        w.write_batch(b)
    w.close()


# stream framing (.arrows) and file framing / feather v2 (.arrow)
write(os.path.join(OUT, "dict_zstd.arrows"), "stream", "zstd")
write(os.path.join(OUT, "dict_lz4.arrows"), "stream", "lz4")
write(os.path.join(OUT, "dict_zstd.arrow"), "file", "zstd")
write(os.path.join(OUT, "dict_plain.arrows"), "stream", None)

for f in sorted(os.listdir(OUT)):
    print(f, os.path.getsize(os.path.join(OUT, f)), "bytes")

# nested struct fixture: struct<a:int64, s:struct<x:double, y:string>, xs:list<int64>>
# with a null struct row and null inner fields — pins ArrowIo's nested read
rows = []
for i in range(30):
    if i % 7 == 3:
        rows.append(None)
    else:
        rows.append({"a": i,
                     "s": None if i % 5 == 2 else
                          {"x": i * 0.25, "y": None if i % 4 == 1 else f"s{i}"},
                     "xs": list(range(i % 3))})
struct_type = pa.struct([
    ("a", pa.int64()),
    ("s", pa.struct([("x", pa.float64()), ("y", pa.string())])),
    ("xs", pa.list_(pa.int64()))])
nested = pa.table({"id": pa.array(range(30), type=pa.int64()),
                   "rec": pa.array(rows, type=struct_type)})
with ipc.new_stream(os.path.join(OUT, "nested_struct.arrows"),
                    nested.schema) as w:
    for b in nested.to_batches(max_chunksize=10):
        w.write_batch(b)
print("nested_struct.arrows",
      os.path.getsize(os.path.join(OUT, "nested_struct.arrows")), "bytes")

# list-of-struct + map fixture: list<struct<k:string, n:int64>> and
# map<string, int64> with null lists/maps, empty ones, and null values —
# pins ArrowIo's full nested read path
los_type = pa.list_(pa.struct([("k", pa.string()), ("n", pa.int64())]))
los_rows = []
map_rows = []
for i in range(30):
    if i % 9 == 4:
        los_rows.append(None)
    else:
        los_rows.append([{"k": f"k{i}_{j}", "n": None if j == 2 else i * 10 + j}
                         for j in range(i % 4)])
    if i % 8 == 5:
        map_rows.append(None)
    else:
        map_rows.append([(f"m{j}", None if j == 1 and i % 2 == 0 else i + j)
                         for j in range(i % 3)])
lom = pa.table({"id": pa.array(range(30), type=pa.int64()),
                "recs": pa.array(los_rows, type=los_type),
                "tags": pa.array(map_rows, type=pa.map_(pa.string(), pa.int64()))})
with ipc.new_stream(os.path.join(OUT, "list_struct_map.arrows"),
                    lom.schema) as w:
    for b in lom.to_batches(max_chunksize=10):
        w.write_batch(b)
print("list_struct_map.arrows",
      os.path.getsize(os.path.join(OUT, "list_struct_map.arrows")), "bytes")
