/**
 * SnelDB JavaScript client (Node.js, zero-dependency).
 *
 * API parity with the reference's packaged JS client (reference:
 * clients/javascript/src — URL-based transport selection, promise API
 * with raising `execute` and safe `tryExecute` flavors, streaming
 * schema/batch/end frame parsing, HMAC-SHA256 auth), implemented
 * against this repo's wire protocol:
 *
 * - tcp://host:port — newline-delimited command in, JSON frames out
 *   (`schema` / `batch` / `end` for reads, one `ok` / `error` line for
 *   writes). Auth: stateless inline `user:sig:<cmd>` (sig = HMAC-SHA256
 *   of the command text) or `AUTH user:sig` handshake answering
 *   `OK TOKEN <t>`, then `<cmd> TOKEN <t>`.
 * - ws://host:port — same line protocol and auth formats inside RFC 6455
 *   text frames (client-masked; PING/CLOSE handled).
 * - http://host:port — POST /command with the command as body; same
 *   frame lines in the response body. Credentials ride as `X-Auth-Token`
 *   or `X-Auth-User` + `X-Auth-Signature` (signature over the body).
 *
 * Usage:
 *   const { SnelDBClient } = require("./sneldb");
 *   const client = await SnelDBClient.connect("tcp://localhost:7171");
 *   await client.define("orders", { amount: "int" });
 *   await client.store("orders", "c1", { amount: 10 });
 *   await client.flush();
 *   const rows = await client.query("QUERY orders WHERE amount >= 5");
 *   await client.close();
 */
"use strict";

const crypto = require("crypto");
const http = require("http");
const https = require("https");
const net = require("net");

class ClientError extends Error {}
class ClientCommandError extends ClientError {}
class ClientAuthError extends ClientError {}
class ClientConnectionError extends ClientError {}

function sign(secretKey, message) {
  return crypto.createHmac("sha256", secretKey).update(message).digest("hex");
}

/** Fold a frame stream (schema/batch.../end | ok | error) into a result. */
function framesToResult(frames) {
  let columns = null;
  const rows = [];
  let total = 0;
  for (const frame of frames) {
    const kind = frame.type;
    if (kind === "error") {
      const msg = frame.message || "";
      if (
        msg.includes("Authentication") ||
        msg.includes("Authorization") ||
        ["401", "403"].includes(msg.slice(0, 3))
      ) {
        throw new ClientAuthError(msg);
      }
      throw new ClientCommandError(msg);
    }
    if (kind === "ok") {
      return { ok: true, rows: [], columns: null, message: frame.message || "", rowCount: 0 };
    }
    if (kind === "schema") {
      columns = Array.from(frame.columns || []);
    } else if (kind === "batch") {
      for (const values of frame.rows || []) {
        const rec = {};
        (columns || []).forEach((c, i) => {
          rec[c] = values[i];
        });
        rows.push(rec);
      }
    } else if (kind === "end") {
      total = frame.row_count != null ? frame.row_count : rows.length;
    }
  }
  if (columns === null) {
    throw new ClientConnectionError("response ended without schema/ok/error frame");
  }
  return { ok: true, rows, columns, message: "", rowCount: total };
}

/** Line-frame reader shared by the TCP and WS transports: collect JSON
 * frame lines until the terminal frame of one command's response. */
class FrameAccumulator {
  constructor() {
    this.buffer = "";
    this.frames = [];
  }

  /** Feed raw text; returns the completed frame list once the terminal
   * frame (end/ok/error) arrives, else null. */
  feed(text) {
    this.buffer += text;
    let idx;
    while ((idx = this.buffer.indexOf("\n")) >= 0) {
      const line = this.buffer.slice(0, idx);
      this.buffer = this.buffer.slice(idx + 1);
      if (!line.trim()) continue;
      let frame;
      try {
        frame = JSON.parse(line);
      } catch (e) {
        throw new ClientConnectionError(`bad frame: ${line.slice(0, 80)}`);
      }
      this.frames.push(frame);
      if (["end", "ok", "error"].includes(frame.type)) {
        const out = this.frames;
        this.frames = [];
        return out;
      }
    }
    return null;
  }
}

class TcpTransport {
  constructor(socket) {
    this.socket = socket;
    this.socket.setEncoding("utf8");
  }

  static connect(host, port, timeoutMs) {
    return new Promise((resolve, reject) => {
      const socket = net.createConnection({ host, port }, () => {
        socket.setTimeout(0);
        resolve(new TcpTransport(socket));
      });
      socket.setTimeout(timeoutMs, () => {
        socket.destroy();
        reject(new ClientConnectionError(`connect timeout to ${host}:${port}`));
      });
      socket.once("error", (e) => reject(new ClientConnectionError(String(e))));
    });
  }

  roundTrip(line, timeoutMs) {
    return new Promise((resolve, reject) => {
      const acc = new FrameAccumulator();
      const timer = setTimeout(() => {
        cleanup();
        reject(new ClientConnectionError("response timeout"));
      }, timeoutMs);
      const onData = (chunk) => {
        let done;
        try {
          done = acc.feed(chunk);
        } catch (e) {
          cleanup();
          return reject(e);
        }
        if (done) {
          cleanup();
          resolve(done);
        }
      };
      const onEnd = () => {
        cleanup();
        reject(new ClientConnectionError("connection closed mid-response"));
      };
      const cleanup = () => {
        clearTimeout(timer);
        this.socket.off("data", onData);
        this.socket.off("end", onEnd);
        this.socket.off("error", onEnd);
      };
      this.socket.on("data", onData);
      this.socket.once("end", onEnd);
      this.socket.once("error", onEnd);
      this.socket.write(line.trim() + "\n");
    });
  }

  close() {
    return new Promise((resolve) => {
      try {
        this.socket.write("QUIT\n");
      } catch (e) {
        /* already closed */
      }
      this.socket.end(() => resolve());
      this.socket.destroy();
      resolve();
    });
  }
}

/** Minimal RFC 6455 client: masked text frames over a net socket,
 * answering server pings, sharing the TCP line protocol. */
class WsTransport {
  constructor(socket) {
    this.socket = socket;
    this.recv = Buffer.alloc(0);
  }

  static connect(host, port, timeoutMs) {
    return new Promise((resolve, reject) => {
      const key = crypto.randomBytes(16).toString("base64");
      const socket = net.createConnection({ host, port }, () => {
        socket.write(
          `GET / HTTP/1.1\r\nHost: ${host}:${port}\r\nUpgrade: websocket\r\n` +
            `Connection: Upgrade\r\nSec-WebSocket-Key: ${key}\r\n` +
            `Sec-WebSocket-Version: 13\r\n\r\n`
        );
      });
      socket.setTimeout(timeoutMs, () => {
        socket.destroy();
        reject(new ClientConnectionError(`connect timeout to ${host}:${port}`));
      });
      let head = Buffer.alloc(0);
      const onData = (chunk) => {
        head = Buffer.concat([head, chunk]);
        const sep = head.indexOf("\r\n\r\n");
        if (sep < 0) return;
        socket.off("data", onData);
        socket.setTimeout(0);
        const headers = head.slice(0, sep).toString();
        if (!/ 101 /.test(headers.split("\r\n")[0])) {
          socket.destroy();
          return reject(new ClientConnectionError(`WS handshake refused: ${headers.split("\r\n")[0]}`));
        }
        const t = new WsTransport(socket);
        t.recv = head.slice(sep + 4);
        resolve(t);
      };
      socket.on("data", onData);
      socket.once("error", (e) => reject(new ClientConnectionError(String(e))));
    });
  }

  _writeFrame(payload, opcode = 0x1) {
    const mask = crypto.randomBytes(4);
    const data = Buffer.from(payload);
    for (let i = 0; i < data.length; i++) data[i] ^= mask[i % 4];
    let header;
    if (data.length < 126) {
      header = Buffer.from([0x80 | opcode, 0x80 | data.length]);
    } else if (data.length < 65536) {
      header = Buffer.alloc(4);
      header[0] = 0x80 | opcode;
      header[1] = 0x80 | 126;
      header.writeUInt16BE(data.length, 2);
    } else {
      header = Buffer.alloc(10);
      header[0] = 0x80 | opcode;
      header[1] = 0x80 | 127;
      header.writeBigUInt64BE(BigInt(data.length), 2);
    }
    this.socket.write(Buffer.concat([header, mask, data]));
  }

  /** Parse one complete server frame out of this.recv, else null. */
  _takeFrame() {
    const buf = this.recv;
    if (buf.length < 2) return null;
    const opcode = buf[0] & 0x0f;
    let len = buf[1] & 0x7f;
    let off = 2;
    if (len === 126) {
      if (buf.length < 4) return null;
      len = buf.readUInt16BE(2);
      off = 4;
    } else if (len === 127) {
      if (buf.length < 10) return null;
      len = Number(buf.readBigUInt64BE(2));
      off = 10;
    }
    const masked = (buf[1] & 0x80) !== 0;
    const maskLen = masked ? 4 : 0;
    if (buf.length < off + maskLen + len) return null;
    let payload = buf.slice(off + maskLen, off + maskLen + len);
    if (masked) {
      const mask = buf.slice(off, off + 4);
      payload = Buffer.from(payload);
      for (let i = 0; i < payload.length; i++) payload[i] ^= mask[i % 4];
    }
    this.recv = buf.slice(off + maskLen + len);
    return { opcode, payload };
  }

  roundTrip(line, timeoutMs) {
    return new Promise((resolve, reject) => {
      const acc = new FrameAccumulator();
      const timer = setTimeout(() => {
        cleanup();
        reject(new ClientConnectionError("response timeout"));
      }, timeoutMs);
      const pump = () => {
        let f;
        while ((f = this._takeFrame()) !== null) {
          if (f.opcode === 0x9) {
            this._writeFrame(f.payload, 0xa); // ping -> pong
            continue;
          }
          if (f.opcode === 0x8) {
            cleanup();
            return reject(new ClientConnectionError("server closed the socket"));
          }
          let done;
          try {
            // servers may emit one frame per line or batch lines together
            done = acc.feed(f.payload.toString("utf8").endsWith("\n")
              ? f.payload.toString("utf8")
              : f.payload.toString("utf8") + "\n");
          } catch (e) {
            cleanup();
            return reject(e);
          }
          if (done) {
            cleanup();
            return resolve(done);
          }
        }
      };
      const onData = (chunk) => {
        this.recv = Buffer.concat([this.recv, chunk]);
        pump();
      };
      const onEnd = () => {
        cleanup();
        reject(new ClientConnectionError("connection closed mid-response"));
      };
      const cleanup = () => {
        clearTimeout(timer);
        this.socket.off("data", onData);
        this.socket.off("end", onEnd);
        this.socket.off("error", onEnd);
      };
      this.socket.on("data", onData);
      this.socket.once("end", onEnd);
      this.socket.once("error", onEnd);
      this._writeFrame(line.trim());
      pump(); // frames may already be buffered
    });
  }

  close() {
    try {
      this._writeFrame(Buffer.alloc(0), 0x8);
    } catch (e) {
      /* already closed */
    }
    this.socket.destroy();
    return Promise.resolve();
  }
}

class HttpTransport {
  constructor(endpoint, timeoutMs) {
    this.endpoint = new URL(endpoint);
    this.timeoutMs = timeoutMs;
  }

  post(command, headers) {
    const mod = this.endpoint.protocol === "https:" ? https : http;
    const body = Buffer.from(command, "utf8");
    return new Promise((resolve, reject) => {
      const req = mod.request(
        {
          hostname: this.endpoint.hostname,
          port: this.endpoint.port,
          path: (this.endpoint.pathname.replace(/\/$/, "") || "") + "/command",
          method: "POST",
          headers: {
            "Content-Type": "text/plain",
            "Content-Length": body.length,
            ...headers,
          },
          timeout: this.timeoutMs,
        },
        (res) => {
          const chunks = [];
          res.on("data", (c) => chunks.push(c));
          res.on("end", () => {
            const text = Buffer.concat(chunks).toString("utf8");
            const acc = new FrameAccumulator();
            try {
              const frames = acc.feed(text.endsWith("\n") ? text : text + "\n");
              if (frames) return resolve(frames);
              if (res.statusCode >= 400) {
                const cls = [401, 403].includes(res.statusCode)
                  ? ClientAuthError
                  : ClientCommandError;
                return reject(new cls(text.trim() || `HTTP ${res.statusCode}`));
              }
              reject(new ClientConnectionError("response ended without a terminal frame"));
            } catch (e) {
              reject(e);
            }
          });
        }
      );
      req.on("timeout", () => {
        req.destroy();
        reject(new ClientConnectionError("response timeout"));
      });
      req.on("error", (e) => reject(new ClientConnectionError(String(e))));
      req.end(body);
    });
  }

  close() {
    return Promise.resolve();
  }
}

class SnelDBClient {
  /**
   * Prefer `SnelDBClient.connect(url, opts)`; the constructor only wires
   * fields. opts: { userId, secretKey, timeoutMs }.
   */
  constructor(kind, transport, opts = {}) {
    this._kind = kind; // "line" (tcp/ws) | "http"
    this._transport = transport;
    this.userId = opts.userId || null;
    this._secretKey = opts.secretKey || null;
    this._token = null;
    this.timeoutMs = opts.timeoutMs || 60000;
  }

  static async connect(url, opts = {}) {
    const u = new URL(url.includes("://") ? url : `tcp://${url}`);
    const timeoutMs = opts.timeoutMs || 60000;
    const host = u.hostname || "localhost";
    if (u.protocol === "http:" || u.protocol === "https:") {
      const port = u.port || (u.protocol === "https:" ? 443 : 80);
      const t = new HttpTransport(`${u.protocol}//${host}:${port}${u.pathname || ""}`, timeoutMs);
      return new SnelDBClient("http", t, opts);
    }
    if (u.protocol === "tcp:" || u.protocol === "ws:") {
      if (!u.port) throw new ClientError(`${u.protocol}// URL needs an explicit port`);
      const T = u.protocol === "tcp:" ? TcpTransport : WsTransport;
      const t = await T.connect(host, Number(u.port), timeoutMs);
      return new SnelDBClient("line", t, opts);
    }
    throw new ClientError(`unsupported scheme ${u.protocol}`);
  }

  // -- core ----------------------------------------------------------------
  async execute(command) {
    command = command.trim();
    if (this._kind === "line") {
      const frames = await this._transport.roundTrip(this._formatLine(command), this.timeoutMs);
      return framesToResult(frames);
    }
    const frames = await this._transport.post(command, this._httpHeaders(command));
    return framesToResult(frames);
  }

  /** Error frames come back as {ok:false, message} instead of throwing. */
  async tryExecute(command) {
    try {
      return await this.execute(command);
    } catch (e) {
      if (e instanceof ClientCommandError || e instanceof ClientAuthError) {
        return { ok: false, rows: [], columns: null, message: String(e.message), rowCount: 0 };
      }
      throw e;
    }
  }

  async query(command) {
    return (await this.execute(command)).rows;
  }

  // -- auth ----------------------------------------------------------------
  async authenticate() {
    if (!(this.userId && this._secretKey)) {
      throw new ClientAuthError("userId and secretKey are required");
    }
    if (this._kind === "line") {
      const sig = sign(this._secretKey, this.userId);
      const frames = await this._transport.roundTrip(`AUTH ${this.userId}:${sig}`, this.timeoutMs);
      const msg = (frames[0] && frames[0].message) || "";
      if (frames[0].type !== "ok" || !msg.includes("TOKEN")) {
        throw new ClientAuthError(msg || "AUTH failed");
      }
      this._token = msg.split(" ").pop();
      return this._token;
    }
    await this.execute("PING");
    return "";
  }

  _formatLine(command) {
    if (this._token) return `${command} TOKEN ${this._token}`;
    if (this.userId && this._secretKey) {
      return `${this.userId}:${sign(this._secretKey, command)}:${command}`;
    }
    return command;
  }

  _httpHeaders(command) {
    if (this._token) return { "X-Auth-Token": this._token };
    if (this.userId && this._secretKey) {
      return {
        "X-Auth-User": this.userId,
        "X-Auth-Signature": sign(this._secretKey, command),
      };
    }
    return {};
  }

  // -- convenience helpers (reference client parity) -----------------------
  async ping() {
    return (await this.execute("PING")).message === "PONG";
  }

  define(eventType, fields, version = null) {
    const ver = version !== null ? ` AS ${version}` : "";
    return this.execute(`DEFINE ${eventType}${ver} FIELDS ${JSON.stringify(fields)}`);
  }

  store(eventType, contextId, payload) {
    return this.execute(`STORE ${eventType} FOR ${contextId} PAYLOAD ${JSON.stringify(payload)}`);
  }

  // Bulk STORE via BATCH round trips of batchSize events — one reply and
  // one server-side WAL group-commit flush per batch instead of per
  // event. events: [[contextId, payload], ...]; rejects on the first
  // failed batch, otherwise resolves with the last batch's result.
  async storeMany(eventType, events, batchSize = 100) {
    const size = Math.max(batchSize, 1);
    let last = { ok: true, message: "OK" };
    for (let i = 0; i < events.length; i += size) {
      const body = events
        .slice(i, i + size)
        .map(([ctx, p]) => `STORE ${eventType} FOR ${ctx} PAYLOAD ${JSON.stringify(p)}`)
        .join("; ");
      last = await this.execute(`BATCH [ ${body} ]`);
    }
    return last;
  }

  flush() {
    return this.execute("FLUSH");
  }

  // -- lifecycle -----------------------------------------------------------
  close() {
    return this._transport.close();
  }
}

module.exports = {
  SnelDBClient,
  ClientError,
  ClientCommandError,
  ClientAuthError,
  ClientConnectionError,
  framesToResult,
  FrameAccumulator,
  sign,
};
