package graft.server

/** Built-in SQL console served at `/` and `/play` (reference capability
  * S25: an embedded play UI, `/root/reference/main.py:54-59,340-352`).
  *
  * Original, dependency-free markup — NOT the reference's bundled UI. It
  * drives the same HTTP surface a ClickHouse client would: `?query=` +
  * `default_format`, POST body for long statements, JSONCompact rendered
  * as a table. The Chart view consumes the JSONCompactColumns feed (the
  * same column-oriented format the reference's console charts with uPlot,
  * `public/index.html:421,1003`) rendered by an original canvas plotter —
  * no vendored chart library. `GRAFT_UI_DIR` still overrides the whole
  * console with a custom bundle.
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
    <button id="chart" title="line chart of numeric columns (JSONCompactColumns feed)">Chart</button>
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
let lastMeta = null; // column names from the last JSONCompact run (chart legend)
function renderCompact(r) {
  lastMeta = r.meta.map(m => m.name);
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
// original canvas line chart over the JSONCompactColumns feed: first
// column = x labels, every numeric column = one series
const PALETTE = ["#4aa8ff","#ffb54a","#6aff8f","#ff6ad5","#b04aff","#4affd9"];
function drawChart(cols) {
  if (!cols.length || !cols[0].length) {
    $("out").innerHTML = "<pre class='error'>no rows to chart</pre>"; return;
  }
  const xs = cols[0];
  const series = [];
  for (let i = 1; i < cols.length; i++)
    if (cols[i].every(v => v === null || typeof v === "number"))
      series.push({ idx: i, data: cols[i] });
  if (!series.length) {
    $("out").innerHTML = "<pre class='error'>no numeric columns to chart</pre>"; return;
  }
  const W = 1040, H = 420, L = 70, R = 16, T = 18, B = 46;
  const c = document.createElement("canvas");
  c.width = W; c.height = H;
  $("out").innerHTML = ""; $("out").appendChild(c);
  const g = c.getContext("2d");
  g.fillStyle = "#1a2029"; g.fillRect(0, 0, W, H);
  const vals = series.flatMap(s => s.data).filter(v => v !== null);
  let lo = Math.min(...vals), hi = Math.max(...vals);
  if (lo === hi) { lo -= 1; hi += 1; }
  const px = i => L + (xs.length === 1 ? 0 : i * (W - L - R) / (xs.length - 1));
  const py = v => T + (hi - v) * (H - T - B) / (hi - lo);
  g.strokeStyle = "#2a3340"; g.fillStyle = "#7a8694"; g.font = "11px monospace";
  for (let t = 0; t <= 4; t++) {
    const v = lo + t * (hi - lo) / 4, y = py(v);
    g.beginPath(); g.moveTo(L, y); g.lineTo(W - R, y); g.stroke();
    g.fillText(Number(v.toPrecision(4)), 6, y + 4);
  }
  const step = Math.max(1, Math.ceil(xs.length / 12));
  for (let i = 0; i < xs.length; i += step) {
    const label = String(xs[i]).slice(0, 12);
    g.fillText(label, Math.min(px(i), W - 80), H - B + 16);
  }
  series.forEach((s, k) => {
    g.strokeStyle = PALETTE[k % PALETTE.length];
    g.lineWidth = 1.6; g.beginPath();
    let started = false;
    s.data.forEach((v, i) => {
      if (v === null) { started = false; return; }
      if (!started) { g.moveTo(px(i), py(v)); started = true; }
      else g.lineTo(px(i), py(v));
    });
    g.stroke();
    const name = (lastMeta && lastMeta.length === cols.length) ?
      lastMeta[s.idx] : "col" + s.idx;
    g.fillStyle = PALETTE[k % PALETTE.length];
    g.fillText(name, L + 8 + k * 140, T + 2);
    g.fillStyle = "#7a8694";
  });
}
async function runChart() {
  const sql = $("sql").value.trim();
  if (!sql) return;
  $("stats").textContent = "charting…";
  try {
    const resp = await fetch("/?default_format=JSONCompactColumns", {
      method: "POST", body: sql });
    const text = await resp.text();
    if (!resp.ok) {
      $("out").innerHTML = "<pre class='error'>" + esc(text) + "</pre>";
      $("stats").textContent = "error"; return;
    }
    drawChart(JSON.parse(text));
    $("stats").textContent = "";
  } catch (e) {
    $("out").innerHTML = "<pre class='error'>" + esc(e) + "</pre>";
    $("stats").textContent = "error";
  }
}
$("run").addEventListener("click", run);
$("chart").addEventListener("click", runChart);
$("sql").addEventListener("keydown", e => {
  if (e.key === "Enter" && (e.ctrlKey || e.metaKey)) { e.preventDefault(); run(); }
});
</script>
</body>
</html>
"""
}
