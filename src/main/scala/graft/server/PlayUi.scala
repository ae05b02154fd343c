package graft.server

/** Built-in SQL console served at `/` and `/play` (reference capability
  * S25: an embedded play UI, `/root/reference/main.py:54-59,340-352`).
  *
  * Original, dependency-free markup — NOT the reference's bundled UI. It
  * drives the same HTTP surface a ClickHouse client would: `?query=` +
  * `default_format`, POST body for long statements, JSONCompact rendered
  * as a table. `GRAFT_UI_DIR` still overrides it with a custom bundle.
  */
object PlayUi {

  val html: String =
    """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>graft-spark play</title>
<style>
  :root { --bg:#12161c; --panel:#1a2029; --fg:#d8dee6; --acc:#4aa8ff; --err:#ff6a6a; }
  * { box-sizing: border-box; }
  body { margin:0; background:var(--bg); color:var(--fg);
         font:14px/1.45 ui-monospace, "SF Mono", Consolas, monospace; }
  header { display:flex; align-items:center; gap:12px; padding:10px 16px;
           background:var(--panel); border-bottom:1px solid #2a3340; }
  header h1 { font-size:15px; margin:0; font-weight:600; color:var(--acc); }
  header .hint { color:#7a8694; font-size:12px; }
  main { padding:16px; max-width:1100px; margin:0 auto; }
  textarea { width:100%; min-height:110px; background:var(--panel); color:var(--fg);
             border:1px solid #2a3340; border-radius:6px; padding:10px; font:inherit;
             resize:vertical; }
  .bar { display:flex; gap:10px; margin:10px 0; align-items:center; }
  button { background:var(--acc); color:#08121e; border:0; border-radius:6px;
           padding:7px 18px; font:inherit; font-weight:600; cursor:pointer; }
  button:hover { filter:brightness(1.1); }
  select { background:var(--panel); color:var(--fg); border:1px solid #2a3340;
           border-radius:6px; padding:6px; font:inherit; }
  #stats { color:#7a8694; font-size:12px; margin-left:auto; }
  #out { margin-top:8px; overflow:auto; }
  table { border-collapse:collapse; width:100%; }
  th, td { border:1px solid #2a3340; padding:4px 10px; text-align:left;
           white-space:pre; }
  th { background:var(--panel); color:var(--acc); position:sticky; top:0; }
  tr:nth-child(even) td { background:#161c24; }
  pre { background:var(--panel); border:1px solid #2a3340; border-radius:6px;
        padding:10px; white-space:pre-wrap; }
  .error { color:var(--err); }
</style>
</head>
<body>
<header>
  <h1>graft-spark play</h1>
  <span class="hint">Ctrl+Enter runs &middot; DuckDB/ClickHouse dialect accepted</span>
</header>
<main>
  <textarea id="sql" spellcheck="false" placeholder="SELECT o_orderpriority, count() AS c FROM orders GROUP BY o_orderpriority ORDER BY c DESC LIMIT 10"></textarea>
  <div class="bar">
    <button id="run">Run</button>
    <select id="fmt">
      <option>JSONCompact</option>
      <option>JSON</option>
      <option>JSONEachRow</option>
      <option>JSONCompactColumns</option>
      <option>CSV</option>
      <option>TSV</option>
    </select>
    <span id="stats"></span>
  </div>
  <div id="out"></div>
</main>
<script>
"use strict";
const $ = id => document.getElementById(id);
function esc(s) {
  return String(s).replace(/[&<>"]/g,
    c => ({"&":"&amp;","<":"&lt;",">":"&gt;",'"':"&quot;"}[c]));
}
function renderCompact(r) {
  let h = "<table><thead><tr>";
  for (const m of r.meta) h += "<th>" + esc(m.name) + "<br><small>" + esc(m.type) + "</small></th>";
  h += "</tr></thead><tbody>";
  for (const row of r.data) {
    h += "<tr>";
    for (const v of row) h += "<td>" + (v === null ? "<i>NULL</i>" : esc(v)) + "</td>";
    h += "</tr>";
  }
  h += "</tbody></table>";
  $("out").innerHTML = h;
  $("stats").textContent = r.rows + " rows in " +
    (r.statistics ? r.statistics.elapsed.toFixed(3) + " s" : "");
}
async function run() {
  const sql = $("sql").value.trim();
  if (!sql) return;
  const fmt = $("fmt").value;
  $("stats").textContent = "running…";
  $("out").innerHTML = "";
  try {
    const resp = await fetch("/?default_format=" + encodeURIComponent(fmt), {
      method: "POST", body: sql });
    const text = await resp.text();
    if (!resp.ok) {
      $("out").innerHTML = "<pre class='error'>" + esc(text) + "</pre>";
      $("stats").textContent = "error";
      return;
    }
    if (fmt === "JSONCompact") renderCompact(JSON.parse(text));
    else { $("out").innerHTML = "<pre>" + esc(text) + "</pre>"; $("stats").textContent = ""; }
  } catch (e) {
    $("out").innerHTML = "<pre class='error'>" + esc(e) + "</pre>";
    $("stats").textContent = "error";
  }
}
$("run").addEventListener("click", run);
$("sql").addEventListener("keydown", e => {
  if (e.key === "Enter" && (e.ctrlKey || e.metaKey)) { e.preventDefault(); run(); }
});
</script>
</body>
</html>
"""
}
