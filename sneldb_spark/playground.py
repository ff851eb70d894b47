"""Self-contained browser playground served by the HTTP frontend.

The reference ships a static SPA from its HTTP listener
(reference: src/frontend/http/static_files.rs, handler.rs:48-95 — `/`
serves the page, `/command` takes the queries). This is the engine's
counterpart: ONE dependency-free HTML page (no CDN assets — it must
work air-gapped) that speaks the same `/command` + `X-Auth-*` protocol
the frontend already exposes. The markup/JS here is an original
minimal console, not a port of the reference's dashboard.
"""

PLAYGROUND_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>SnelDB Playground</title>
<style>
  :root { --bg:#11151c; --panel:#1a2029; --edge:#2c3542; --ink:#e6e8ee;
          --dim:#8a93a5; --ok:#4cc38a; --err:#e5534b; --accent:#5b9dd9; }
  * { box-sizing:border-box; }
  body { margin:0; background:var(--bg); color:var(--ink);
         font:14px/1.5 ui-monospace,Menlo,Consolas,monospace; }
  main { max-width:960px; margin:0 auto; padding:24px 16px; }
  h1 { font-size:18px; margin:0 0 4px; }
  h1 small { color:var(--dim); font-weight:normal; }
  .row { display:flex; gap:8px; margin-top:12px; flex-wrap:wrap; }
  textarea, input { background:var(--panel); color:var(--ink);
    border:1px solid var(--edge); border-radius:6px; padding:8px;
    font:inherit; }
  textarea { width:100%; min-height:72px; resize:vertical; }
  input { flex:1; min-width:140px; }
  button { background:var(--accent); color:#fff; border:0;
    border-radius:6px; padding:8px 18px; font:inherit; cursor:pointer; }
  button.ghost { background:var(--panel); color:var(--dim);
    border:1px solid var(--edge); }
  #out { margin-top:16px; }
  .frame-ok { color:var(--ok); }
  .frame-err { color:var(--err); }
  table { border-collapse:collapse; margin-top:8px; width:100%; }
  th, td { border:1px solid var(--edge); padding:4px 8px; text-align:left; }
  th { background:var(--panel); }
  .examples button { display:inline-block; margin:2px; }
  .meta { color:var(--dim); font-size:12px; margin-top:6px; }
</style>
</head>
<body>
<main>
  <h1>SnelDB Playground <small>&mdash; one command per run, NDJSON frames back</small></h1>
  <div class="meta">POST /command &middot; auth headers optional
    (X-Auth-User + X-Auth-Signature of the exact body, or X-Auth-Token)</div>
  <textarea id="cmd" spellcheck="false">PING</textarea>
  <div class="row">
    <input id="user" placeholder="user (optional)">
    <input id="sig" placeholder="signature (optional)">
    <input id="token" placeholder="session token (optional)">
    <button id="run">Run</button>
  </div>
  <div class="row examples" id="examples"></div>
  <div id="out"></div>
</main>
<script>
"use strict";
const EXAMPLES = [
  'PING',
  'DEFINE orders FIELDS { "amount": "int", "country": "string" }',
  'STORE orders FOR ctx1 PAYLOAD { "amount": 42, "country": "NL" }',
  'FLUSH',
  'QUERY orders WHERE amount > 10',
  'QUERY orders COUNT BY country',
];
const $ = (id) => document.getElementById(id);
const exBox = $("examples");
for (const ex of EXAMPLES) {
  const b = document.createElement("button");
  b.className = "ghost"; b.textContent = ex.split(" ").slice(0, 2).join(" ");
  b.title = ex;
  b.onclick = () => { $("cmd").value = ex; };
  exBox.appendChild(b);
}

function renderFrames(text) {
  const out = $("out"); out.textContent = "";
  let schema = null, rows = [];
  for (const line of text.split("\\n")) {
    if (!line.trim()) continue;
    let f;
    try { f = JSON.parse(line); } catch { continue; }
    if (f.type === "schema") { schema = f.columns || f.fields || null; }
    else if (f.type === "batch" || f.type === "row") {
      for (const r of (f.rows || [f.row]).filter(Boolean)) rows.push(r);
    } else if (f.type === "ok") {
      const d = document.createElement("div");
      d.className = "frame-ok"; d.textContent = "ok: " + (f.message ?? "");
      out.appendChild(d);
    } else if (f.type === "error") {
      const d = document.createElement("div");
      d.className = "frame-err"; d.textContent = "error: " + (f.message ?? "");
      out.appendChild(d);
    }
  }
  if (rows.length) {
    const cols = schema ? schema.map(c => c.name ?? c)
                        : Object.keys(rows[0]);
    const tbl = document.createElement("table");
    const hr = tbl.insertRow();
    for (const c of cols) {
      const th = document.createElement("th"); th.textContent = c;
      hr.appendChild(th);
    }
    for (const r of rows) {
      const tr = tbl.insertRow();
      for (const c of cols) {
        const v = Array.isArray(r) ? r[cols.indexOf(c)] : r[c];
        tr.insertCell().textContent = v === null ? "NULL" : String(v);
      }
    }
    $("out").appendChild(tbl);
    const meta = document.createElement("div");
    meta.className = "meta"; meta.textContent = rows.length + " row(s)";
    $("out").appendChild(meta);
  }
}

$("run").onclick = async () => {
  const body = $("cmd").value.trim();
  if (!body) return;
  const headers = {};
  if ($("token").value) headers["X-Auth-Token"] = $("token").value.trim();
  else if ($("user").value) {
    headers["X-Auth-User"] = $("user").value.trim();
    headers["X-Auth-Signature"] = $("sig").value.trim();
  }
  $("out").textContent = "...";
  try {
    const res = await fetch("/command", { method: "POST", headers, body });
    renderFrames(await res.text());
  } catch (e) {
    $("out").textContent = "request failed: " + e;
  }
};
$("cmd").addEventListener("keydown", (e) => {
  if ((e.ctrlKey || e.metaKey) && e.key === "Enter") $("run").click();
});
</script>
</body>
</html>
"""
