"""Child side of the wordstats.apply Arrow-IPC bridge — pure
pyarrow + stdlib, NO Spark and NO conveyor_spark imports. Any
runtime that speaks Arrow IPC could replace this file unchanged;
that interchangeability is the property the reference's FFI plugin
boundary has (src/core/stage.rs:345-394) and this example proves.

Protocol: length-prefixed (uint32-LE) Arrow IPC stream frames on
stdin; one transformed frame per input frame on stdout; EOF ends.
Config (JSON) arrives as argv[1]: {"column", "output_column"}.
"""

from __future__ import annotations

import json
import struct
import sys

_FRAME_HDR = struct.Struct("<I")


def read_exact(pipe, n: int) -> bytes:
    chunks = []
    while n:
        chunk = pipe.read(n)
        if not chunk:
            raise EOFError
        chunks.append(chunk)
        n -= len(chunk)
    return b"".join(chunks)


def main(argv: list[str]) -> int:
    import pyarrow as pa

    cfg = json.loads(argv[0])
    column, out_col = cfg["column"], cfg["output_column"]
    stdin, stdout = sys.stdin.buffer, sys.stdout.buffer

    while True:
        try:
            (n,) = _FRAME_HDR.unpack(read_exact(stdin, _FRAME_HDR.size))
            payload = read_exact(stdin, n)
        except EOFError:
            return 0
        with pa.ipc.open_stream(pa.BufferReader(payload)) as reader:
            batches = list(reader)
        for batch in batches:
            counts = [
                None if text is None else len(text.split())
                for text in batch.column(column).to_pylist()
            ]
            out_batch = pa.RecordBatch.from_arrays(
                list(batch.columns) + [pa.array(counts, type=pa.int64())],
                names=batch.schema.names + [out_col],
            )
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, out_batch.schema) as writer:
                writer.write_batch(out_batch)
            frame = sink.getvalue().to_pybytes()
            stdout.write(_FRAME_HDR.pack(len(frame)))
            stdout.write(frame)
            stdout.flush()


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
