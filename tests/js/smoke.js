// End-to-end smoke for the JavaScript client, driven by
// tests/test_js_client.py. Args: <tcpPort> <httpPort> <wsPort>
// [userId secretKey]. Prints one JSON line with per-step results;
// the pytest side asserts on it.
"use strict";

const path = require("path");
const { SnelDBClient } = require(path.join(
  __dirname, "..", "..", "clients", "javascript", "sneldb.js"
));

async function exercise(client, tag, out) {
  await client.define(`evt_${tag}`, { amount: "int", country: "string" });
  await client.store(`evt_${tag}`, "c1", { amount: 10, country: "NL" });
  await client.store(`evt_${tag}`, "c2", { amount: 3, country: "BE" });
  await client.store(`evt_${tag}`, "c1", { amount: 25, country: "NL" });
  await client.flush();
  const rows = await client.query(
    `QUERY evt_${tag} WHERE amount >= 5 ORDER BY event_id LIMIT 10`
  );
  out[`${tag}_rows`] = rows.map((r) => [r.context_id, r.amount, r.country]);
  out[`${tag}_ping`] = await client.ping();
  const bulk = await client.storeMany(
    `evt_${tag}`,
    Array.from({ length: 7 }, (_, i) => [`b${i}`, { amount: 100 + i, country: "XX" }]),
    3 // forces 3 BATCH round trips
  );
  await client.flush();
  const bulkRows = await client.query(`QUERY evt_${tag} WHERE country = "XX"`);
  // hostile payload: escaped quote + "] ;" must survive the BATCH body
  await client.define(`evh_${tag}`, { msg: "string" });
  const hostile = 'a" ] ;x \\ {see}; DROP';
  await client.storeMany(`evh_${tag}`, [["h1", { msg: hostile }], ["h2", { msg: "plain" }]], 2);
  await client.flush();
  const hRows = await client.query(`QUERY evh_${tag}`);
  const hOk = hRows.length === 2 &&
    hRows.some((r) => r.msg === hostile) && hRows.some((r) => r.msg === "plain");
  out[`${tag}_bulk_ok`] = bulk.ok && bulkRows.length === 7 && hOk;
  const bad = await client.tryExecute("BOGUS");
  out[`${tag}_bad_ok`] = bad.ok;
  out[`${tag}_bad_msg_nonempty`] = bad.message.length > 0;
}

async function main() {
  const [tcpPort, httpPort, wsPort, userId, secretKey] = process.argv.slice(2);
  const out = {};
  const opts = userId ? { userId, secretKey } : {};

  const tcp = await SnelDBClient.connect(`tcp://127.0.0.1:${tcpPort}`, opts);
  if (userId) out.token = Boolean(await tcp.authenticate());
  await exercise(tcp, "tcp", out);
  await tcp.close();

  const httpc = await SnelDBClient.connect(`http://127.0.0.1:${httpPort}`, opts);
  await exercise(httpc, "http", out);
  // cross-transport visibility: HTTP sees what TCP stored
  out.cross_rows = (await httpc.query("QUERY evt_tcp")).length;
  await httpc.close();

  if (wsPort && wsPort !== "0") {
    const ws = await SnelDBClient.connect(`ws://127.0.0.1:${wsPort}`, opts);
    await exercise(ws, "ws", out);
    await ws.close();
  }

  console.log(JSON.stringify(out));
}

main().catch((e) => {
  console.error(String(e && e.stack ? e.stack : e));
  process.exit(1);
});
