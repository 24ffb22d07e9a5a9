#!/usr/bin/env node
// Minimal NBQL TCP client in dependency-free Node — the JS/TS-ecosystem
// interop proof for the framed wire protocol (the reference ships a
// TypeScript client; this is an independent implementation of the same
// byte layout: [type:1][len:4 BE][payload][crc32c:4 BE], same
// string/tags/fields codecs, same `?` parameter quoting). Driver-side
// tooling like check_oracle.py / nbql_client.py, not library code.
//
// Usage:
//   nbql_client.js <host> <port> push <metric> <ts> <field>=<num> [k=v ...]
//   nbql_client.js <host> <port> query "<nbql>" [param ...]
//
// Prints one JSON line per result row, then a {"total": N} trailer.
"use strict";
const net = require("net");

const CMD_PUSH = 0x01;
const CMD_QUERY = 0x10;
const CMD_QUERY_END = 0x12;
const CMD_ERROR = 0xee;

// CRC-32C (Castagnoli), bitwise form — independent of the Scala and
// Python implementations on purpose (three-way cross-check).
function crc32c(buf) {
  let crc = 0xffffffff;
  for (const b of buf) {
    crc ^= b;
    for (let i = 0; i < 8; i++) {
      crc = (crc >>> 1) ^ (0x82f63b78 * (crc & 1));
      crc >>>= 0;
    }
  }
  return (crc ^ 0xffffffff) >>> 0;
}

function wString(s) {
  const b = Buffer.from(s, "utf-8");
  const out = Buffer.alloc(2 + b.length);
  out.writeUInt16BE(b.length, 0);
  b.copy(out, 2);
  return out;
}

function rString(buf, off) {
  const n = buf.readUInt16BE(off);
  off += 2;
  return [buf.toString("utf-8", off, off + n), off + n];
}

function wTags(tags) {
  const parts = [Buffer.alloc(2)];
  const keys = Object.keys(tags);
  parts[0].writeUInt16BE(keys.length, 0);
  for (const k of keys) parts.push(wString(k), wString(tags[k]));
  return Buffer.concat(parts);
}

function rTags(buf, off) {
  const n = buf.readUInt16BE(off);
  off += 2;
  const tags = {};
  for (let i = 0; i < n; i++) {
    let k, v;
    [k, off] = rString(buf, off);
    [v, off] = rString(buf, off);
    tags[k] = v;
  }
  return [tags, off];
}

function wFields(fields) {
  const parts = [Buffer.alloc(2)];
  const keys = Object.keys(fields);
  parts[0].writeUInt16BE(keys.length, 0);
  for (const k of keys) {
    parts.push(wString(k));
    const v = fields[k];
    if (typeof v === "boolean") {
      const b = Buffer.alloc(2);
      b.writeUInt8(4, 0);
      b.writeUInt8(v ? 1 : 0, 1);
      parts.push(b);
    } else if (Number.isInteger(v)) {
      const b = Buffer.alloc(9);
      b.writeUInt8(2, 0);
      b.writeBigInt64BE(BigInt(v), 1);
      parts.push(b);
    } else if (typeof v === "number") {
      const b = Buffer.alloc(9);
      b.writeUInt8(1, 0);
      b.writeDoubleBE(v, 1);
      parts.push(b);
    } else {
      const sb = Buffer.from(String(v), "utf-8");
      const b = Buffer.alloc(5);
      b.writeUInt8(3, 0);
      b.writeUInt32BE(sb.length, 1);
      parts.push(b, sb);
    }
  }
  const block = Buffer.concat(parts);
  const len = Buffer.alloc(4);
  len.writeUInt32BE(block.length, 0);
  return Buffer.concat([len, block]);
}

function rFields(buf, off) {
  const blen = buf.readUInt32BE(off);
  off += 4;
  const end = off + blen;
  const n = buf.readUInt16BE(off);
  off += 2;
  const fields = {};
  for (let i = 0; i < n; i++) {
    let k;
    [k, off] = rString(buf, off);
    const tag = buf.readUInt8(off);
    off += 1;
    let v = null;
    if (tag === 1) {
      v = buf.readDoubleBE(off);
      off += 8;
    } else if (tag === 2) {
      v = Number(buf.readBigInt64BE(off));
      off += 8;
    } else if (tag === 3) {
      const sn = buf.readUInt32BE(off);
      off += 4;
      v = buf.toString("utf-8", off, off + sn);
      off += sn;
    } else if (tag === 4) {
      v = buf.readUInt8(off) !== 0;
      off += 1;
    }
    fields[k] = v;
  }
  return [fields, end];
}

function quoteParam(p) {
  if (typeof p === "number") return String(p);
  if (/^-?\d+(\.\d+)?$/.test(p)) return p; // numeric-looking argv strings
  return '"' + String(p).replace(/"/g, '""') + '"';
}

function formatQuery(template, params) {
  const parts = template.split("?");
  if (parts.length - 1 !== params.length) throw new Error("placeholder mismatch");
  let out = "";
  parts.forEach((part, i) => {
    out += part;
    if (i < params.length) out += quoteParam(params[i]);
  });
  return out;
}

function frame(cmd, payload) {
  const header = Buffer.alloc(5);
  header.writeUInt8(cmd, 0);
  header.writeUInt32BE(payload.length + 4, 1);
  const crc = Buffer.alloc(4);
  crc.writeUInt32BE(crc32c(Buffer.concat([header, payload])), 0);
  return Buffer.concat([header, payload, crc]);
}

function decodePart(payload) {
  let off = 2; // status, flags
  const flags = payload.readUInt8(1);
  let cursor;
  [cursor, off] = rString(payload, off);
  const n = payload.readUInt32BE(off);
  off += 4;
  const rows = [];
  const agg = (flags & 0x02) !== 0;
  for (let i = 0; i < n; i++) {
    const seq = Number(payload.readBigInt64BE(off));
    off += 8;
    let metric, tags;
    [metric, off] = rString(payload, off);
    [tags, off] = rTags(payload, off);
    const ts = Number(payload.readBigInt64BE(off));
    off += 8;
    if (agg) {
      const ws = Number(payload.readBigInt64BE(off));
      off += 8;
      const na = payload.readUInt16BE(off);
      off += 2;
      const aggs = {};
      for (let j = 0; j < na; j++) {
        let k;
        [k, off] = rString(payload, off);
        aggs[k] = payload.readDoubleBE(off);
        off += 8;
      }
      rows.push({ metric, tags, window_start: ws, aggregated: aggs });
    } else {
      let fields;
      [fields, off] = rFields(payload, off);
      rows.push({ seq, metric, tags, timestamp: ts, fields });
    }
  }
  return [rows, cursor];
}

// Buffered frame reader over the socket stream.
function makeReader(sock, onFrame, onError) {
  let buf = Buffer.alloc(0);
  sock.on("data", (chunk) => {
    buf = Buffer.concat([buf, chunk]);
    for (;;) {
      if (buf.length < 5) return;
      const len = buf.readUInt32BE(1);
      if (buf.length < 5 + len) return;
      const header = buf.subarray(0, 5);
      const payload = buf.subarray(5, 5 + len - 4);
      const crc = buf.readUInt32BE(5 + len - 4);
      if (crc !== crc32c(Buffer.concat([header, payload]))) {
        onError(new Error("frame checksum mismatch"));
        return;
      }
      const cmd = buf.readUInt8(0);
      buf = buf.subarray(5 + len);
      onFrame(cmd, Buffer.from(payload));
    }
  });
}

function sortedJson(obj) {
  const sortKeys = (v) => {
    if (Array.isArray(v)) return v.map(sortKeys);
    if (v && typeof v === "object") {
      const o = {};
      for (const k of Object.keys(v).sort()) o[k] = sortKeys(v[k]);
      return o;
    }
    return v;
  };
  return JSON.stringify(sortKeys(obj));
}

function main() {
  const [host, port, mode, ...rest] = process.argv.slice(2);
  const sock = net.createConnection(Number(port), host);
  sock.setNoDelay(true);
  const die = (e) => {
    console.error(String(e));
    process.exit(1);
  };
  sock.on("error", die);
  sock.on("connect", () => {
    if (mode === "push") {
      const [metric, ts, ...kvs] = rest;
      const fields = {};
      const tags = {};
      for (const kv of kvs) {
        const i = kv.indexOf("=");
        const k = kv.slice(0, i);
        const v = kv.slice(i + 1);
        if (/^-?\d+$/.test(v)) fields[k] = parseInt(v, 10);
        else if (/^-?\d+\.\d+$/.test(v)) fields[k] = parseFloat(v);
        else tags[k] = v;
      }
      const tsb = Buffer.alloc(8);
      tsb.writeBigInt64BE(BigInt(ts), 0);
      const payload = Buffer.concat([wString(metric), wTags(tags), tsb, wFields(fields)]);
      sock.write(frame(CMD_PUSH, payload));
      makeReader(sock, (cmd, resp) => {
        if (cmd === CMD_ERROR) {
          const code = resp.readUInt16BE(0);
          const [msg] = rString(resp, 2);
          console.log(sortedJson({ error: msg, code }));
          process.exit(1);
        }
        const rows = Number(resp.readBigInt64BE(1));
        console.log(sortedJson({ rows_affected: rows }));
        sock.end();
      }, die);
    } else if (mode === "query") {
      let q = rest[0];
      if (rest.length > 1) q = formatQuery(q, rest.slice(1));
      sock.write(frame(CMD_QUERY, wString(q)));
      makeReader(sock, (cmd, resp) => {
        if (cmd === CMD_ERROR) {
          const code = resp.readUInt16BE(0);
          const [msg] = rString(resp, 2);
          console.log(sortedJson({ error: msg, code }));
          process.exit(1);
        }
        if (cmd === CMD_QUERY_END) {
          const total = Number(resp.readBigInt64BE(1));
          console.log(sortedJson({ total }));
          sock.end();
          return;
        }
        const [rows, cursor] = decodePart(resp);
        for (const r of rows) console.log(sortedJson(r));
        if (cursor) console.log(sortedJson({ next_cursor: cursor }));
      }, die);
    } else {
      die(new Error(`unknown mode ${mode}`));
    }
  });
}

main();
