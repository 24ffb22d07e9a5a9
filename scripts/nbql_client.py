#!/usr/bin/env python3
"""Minimal NBQL TCP client — the cross-language interop proof for the
framed wire protocol (byte-compatible with the reference's
clients/nbql/python/nbql: same frame layout [type:1][len:4 BE][payload]
[crc32c:4 BE], same string/tags/fields codecs, same `?` parameter
quoting). Driver-side tooling like check_oracle.py, not library code.

Usage:
  nbql_client.py <host> <port> push <metric> <ts> <field>=<num> [k=v ...]
  nbql_client.py <host> <port> query "<nbql>" [param ...]

Prints one JSON line per result row, then a `{"total": N}` trailer.
"""
import json
import socket
import struct
import sys
import zlib

CMD_PUSH = 0x01
CMD_QUERY = 0x10
CMD_QUERY_RESULT_PART = 0x11
CMD_QUERY_END = 0x12
CMD_MANIPULATE = 0x20
CMD_ERROR = 0xEE


def crc32c(data):
    # CRC-32C (Castagnoli) — tiny table-less bitwise form; the frames are
    # small and this is a smoke tool, not a throughput path.
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 * (crc & 1))
    return crc ^ 0xFFFFFFFF


def write_frame(sock, cmd, payload):
    header = struct.pack(">BI", cmd, len(payload) + 4)
    c = crc32c(header + payload)
    sock.sendall(header + payload + struct.pack(">I", c))


def read_exact(sock, n):
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise EOFError("server closed connection")
        buf += chunk
    return buf


def read_frame(sock):
    header = read_exact(sock, 5)
    cmd, length = struct.unpack(">BI", header)
    body = read_exact(sock, length)
    payload, crc = body[:-4], struct.unpack(">I", body[-4:])[0]
    if crc != crc32c(header + payload):
        raise IOError("frame checksum mismatch")
    return cmd, payload


def w_string(s):
    b = s.encode("utf-8")
    return struct.pack(">H", len(b)) + b


def r_string(buf, off):
    (n,) = struct.unpack_from(">H", buf, off)
    off += 2
    return buf[off:off + n].decode("utf-8"), off + n


def w_tags(tags):
    out = struct.pack(">H", len(tags))
    for k, v in tags.items():
        out += w_string(k) + w_string(v)
    return out


def r_tags(buf, off):
    (n,) = struct.unpack_from(">H", buf, off)
    off += 2
    tags = {}
    for _ in range(n):
        k, off = r_string(buf, off)
        v, off = r_string(buf, off)
        tags[k] = v
    return tags, off


def w_fields(fields):
    """fields: dict name -> float|int|str|bool|None (reference type tags)."""
    block = struct.pack(">H", len(fields))
    for k, v in fields.items():
        block += w_string(k)
        if v is None:
            block += struct.pack(">B", 0)
        elif isinstance(v, bool):
            block += struct.pack(">BB", 4, 1 if v else 0)
        elif isinstance(v, int):
            block += struct.pack(">Bq", 2, v)
        elif isinstance(v, float):
            block += struct.pack(">Bd", 1, v)
        else:
            b = str(v).encode("utf-8")
            block += struct.pack(">BI", 3, len(b)) + b
    return struct.pack(">I", len(block)) + block


def r_fields(buf, off):
    (blen,) = struct.unpack_from(">I", buf, off)
    off += 4
    end = off + blen
    (n,) = struct.unpack_from(">H", buf, off)
    off += 2
    fields = {}
    for _ in range(n):
        k, off = r_string(buf, off)
        (tag,) = struct.unpack_from(">B", buf, off)
        off += 1
        if tag == 1:
            (v,) = struct.unpack_from(">d", buf, off)
            off += 8
        elif tag == 2:
            (v,) = struct.unpack_from(">q", buf, off)
            off += 8
        elif tag == 3:
            (sn,) = struct.unpack_from(">I", buf, off)
            off += 4
            v = buf[off:off + sn].decode("utf-8")
            off += sn
        elif tag == 4:
            v = buf[off] != 0
            off += 1
        else:
            v = None
        fields[k] = v
    return fields, end


def quote_param(p):
    if isinstance(p, (int, float)):
        return str(p)
    return '"' + str(p).replace('"', '""') + '"'


def format_query(template, params):
    parts = template.split("?")
    if len(parts) - 1 != len(params):
        raise ValueError("placeholder mismatch")
    out = []
    for i, part in enumerate(parts):
        out.append(part)
        if i < len(params):
            out.append(quote_param(params[i]))
    return "".join(out)


def decode_part(payload):
    off = 0
    _status, flags = payload[0], payload[1]
    off = 2
    cursor, off = r_string(payload, off)
    (n,) = struct.unpack_from(">I", payload, off)
    off += 4
    rows = []
    agg = bool(flags & 0x02)
    for _ in range(n):
        (seq,) = struct.unpack_from(">q", payload, off)
        off += 8
        metric, off = r_string(payload, off)
        tags, off = r_tags(payload, off)
        (ts,) = struct.unpack_from(">q", payload, off)
        off += 8
        if agg:
            (ws,) = struct.unpack_from(">q", payload, off)
            off += 8
            (na,) = struct.unpack_from(">H", payload, off)
            off += 2
            aggs = {}
            for _ in range(na):
                k, off = r_string(payload, off)
                (v,) = struct.unpack_from(">d", payload, off)
                off += 8
                aggs[k] = v
            rows.append({"metric": metric, "tags": tags, "window_start": ws,
                         "aggregated": aggs})
        else:
            fields, off = r_fields(payload, off)
            rows.append({"seq": seq, "metric": metric, "tags": tags,
                         "timestamp": ts, "fields": fields})
    return rows, cursor


def main():
    host, port, mode = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    sock = socket.create_connection((host, port), timeout=30)
    try:
        if mode == "push":
            metric, ts = sys.argv[4], int(sys.argv[5])
            fields, tags = {}, {}
            for kv in sys.argv[6:]:
                k, v = kv.split("=", 1)
                try:
                    fields[k] = float(v) if "." in v else int(v)
                except ValueError:
                    tags[k] = v
            payload = w_string(metric) + w_tags(tags) + struct.pack(">q", ts) \
                + w_fields(fields)
            write_frame(sock, CMD_PUSH, payload)
            cmd, resp = read_frame(sock)
            if cmd == CMD_ERROR:
                (code,) = struct.unpack_from(">H", resp, 0)
                msg, _ = r_string(resp, 2)
                print(json.dumps({"error": msg, "code": code}))
                sys.exit(1)
            (rows,) = struct.unpack_from(">q", resp, 1)
            print(json.dumps({"rows_affected": rows}))
        elif mode == "query":
            q = sys.argv[4]
            if len(sys.argv) > 5:
                q = format_query(q, sys.argv[5:])
            write_frame(sock, CMD_QUERY, w_string(q))
            total = 0
            while True:
                cmd, resp = read_frame(sock)
                if cmd == CMD_ERROR:
                    (code,) = struct.unpack_from(">H", resp, 0)
                    msg, _ = r_string(resp, 2)
                    print(json.dumps({"error": msg, "code": code}))
                    sys.exit(1)
                if cmd == CMD_QUERY_END:
                    (total,) = struct.unpack_from(">q", resp, 1)
                    print(json.dumps({"total": total}))
                    break
                rows, cursor = decode_part(resp)
                for r in rows:
                    print(json.dumps(r, sort_keys=True))
                if cursor:
                    print(json.dumps({"next_cursor": cursor}))
        else:
            raise SystemExit(f"unknown mode {mode}")
    finally:
        sock.close()


if __name__ == "__main__":
    main()
