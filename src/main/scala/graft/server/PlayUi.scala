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
    <button id="chart" title="chart numeric columns (JSONCompactColumns feed)">Chart</button>
    <select id="ctype" title="chart type">
      <option>line</option>
      <option>area</option>
      <option>bar</option>
      <option>scatter</option>
    </select>
    <select id="fmt">
      <option>JSONCompact</option>
      <option>JSON</option>
      <option>JSONEachRow</option>
      <option>JSONCompactColumns</option>
      <option>CSV</option>
      <option>TSV</option>
    </select>
    <button id="csv" title="download the last result as CSV">&#8681; CSV</button>
    <select id="hist" title="query history"><option value="">history…</option></select>
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
// original canvas plotter over the JSONCompactColumns feed: first column
// = x labels, every numeric column = one series. Types: line, area, bar
// (grouped), scatter. Hover crosshair + tooltip on a second canvas layer.
const PALETTE = ["#4aa8ff","#ffb54a","#6aff8f","#ff6ad5","#b04aff","#4affd9"];
let chartState = null; // geometry captured for the hover layer
function drawChart(cols) {
  if (!cols.length || !cols[0].length) {
    $("out").innerHTML = "<pre class='error'>no rows to chart</pre>"; return;
  }
  const type = $("ctype").value;
  const xs = cols[0];
  const series = [];
  for (let i = 1; i < cols.length; i++)
    if (cols[i].every(v => v === null || typeof v === "number"))
      series.push({ idx: i, data: cols[i] });
  if (!series.length) {
    $("out").innerHTML = "<pre class='error'>no numeric columns to chart</pre>"; return;
  }
  const W = 1040, H = 420, L = 70, R = 16, T = 18, B = 46;
  const wrap = document.createElement("div");
  wrap.style.position = "relative"; wrap.style.width = W + "px";
  const c = document.createElement("canvas");
  const ov = document.createElement("canvas"); // hover layer
  for (const cv of [c, ov]) { cv.width = W; cv.height = H; }
  ov.style.position = "absolute"; ov.style.left = 0; ov.style.top = 0;
  $("out").innerHTML = ""; wrap.appendChild(c); wrap.appendChild(ov);
  $("out").appendChild(wrap);
  const g = c.getContext("2d");
  g.fillStyle = "#1a2029"; g.fillRect(0, 0, W, H);
  const vals = series.flatMap(s => s.data).filter(v => v !== null);
  let lo = Math.min(...vals), hi = Math.max(...vals);
  if (type === "bar" || type === "area") lo = Math.min(lo, 0);
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
  const names = series.map(s =>
    (lastMeta && lastMeta.length === cols.length) ? lastMeta[s.idx] : "col" + s.idx);
  if (type === "bar") {
    const slot = (W - L - R) / xs.length;
    const bw = Math.max(1, slot * 0.8 / series.length);
    series.forEach((s, k) => {
      g.fillStyle = PALETTE[k % PALETTE.length];
      s.data.forEach((v, i) => {
        if (v === null) return;
        const x0 = L + i * slot + slot * 0.1 + k * bw;
        const y0 = py(Math.max(v, 0)), y1 = py(Math.min(v, 0));
        g.fillRect(x0, y0, bw, Math.max(1, y1 - y0));
      });
    });
  } else {
    series.forEach((s, k) => {
      const col = PALETTE[k % PALETTE.length];
      if (type !== "scatter") {
        g.strokeStyle = col; g.lineWidth = 1.6; g.beginPath();
        let started = false;
        s.data.forEach((v, i) => {
          if (v === null) { started = false; return; }
          if (!started) { g.moveTo(px(i), py(v)); started = true; }
          else g.lineTo(px(i), py(v));
        });
        g.stroke();
        if (type === "area") {
          g.globalAlpha = 0.18; g.fillStyle = col; g.lineTo(px(xs.length - 1), py(0));
          g.lineTo(px(0), py(0)); g.closePath(); g.fill(); g.globalAlpha = 1;
        }
      }
      if (type === "scatter" || xs.length <= 60) {
        g.fillStyle = col;
        s.data.forEach((v, i) => {
          if (v === null) return;
          g.beginPath(); g.arc(px(i), py(v), type === "scatter" ? 3 : 2.2, 0, 7); g.fill();
        });
      }
    });
  }
  series.forEach((s, k) => {
    g.fillStyle = PALETTE[k % PALETTE.length];
    g.fillText(names[k], L + 8 + k * 140, T + 2);
  });
  chartState = { xs, series, names, px, L, R, W, H, T, B };
  ov.addEventListener("mousemove", e => {
    const st = chartState; if (!st) return;
    const rect = ov.getBoundingClientRect();
    const mx = e.clientX - rect.left;
    const og = ov.getContext("2d");
    og.clearRect(0, 0, W, H);
    if (mx < st.L || mx > W - st.R) return;
    // nearest x index
    let best = 0, bd = 1e18;
    for (let i = 0; i < st.xs.length; i++) {
      const d = Math.abs(st.px(i) - mx);
      if (d < bd) { bd = d; best = i; }
    }
    og.strokeStyle = "#7a8694"; og.setLineDash([4, 3]);
    og.beginPath(); og.moveTo(st.px(best), st.T); og.lineTo(st.px(best), H - st.B); og.stroke();
    og.setLineDash([]);
    const lines = [String(st.xs[best])].concat(st.series.map((s, k) =>
      st.names[k] + ": " + (s.data[best] === null ? "NULL" : s.data[best])));
    const bw = Math.max(...lines.map(l => l.length)) * 7 + 16, bh = lines.length * 15 + 8;
    const bx = Math.min(st.px(best) + 10, W - bw - 4), by = st.T + 6;
    og.fillStyle = "rgba(18,22,28,0.92)"; og.fillRect(bx, by, bw, bh);
    og.strokeStyle = "#2a3340"; og.strokeRect(bx, by, bw, bh);
    og.font = "11px monospace";
    lines.forEach((l, i) => {
      og.fillStyle = i === 0 ? "#d8dee6" : PALETTE[(i - 1) % PALETTE.length];
      og.fillText(l, bx + 8, by + 16 + i * 15);
    });
  });
  ov.addEventListener("mouseleave", () => ov.getContext("2d").clearRect(0, 0, W, H));
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
// CSV download of the current statement (server-rendered CSV format)
async function downloadCsv() {
  const sql = $("sql").value.trim();
  if (!sql) return;
  const resp = await fetch("/?default_format=CSV", { method: "POST", body: sql });
  const text = await resp.text();
  if (!resp.ok) {
    $("out").innerHTML = "<pre class='error'>" + esc(text) + "</pre>"; return;
  }
  const a = document.createElement("a");
  a.href = URL.createObjectURL(new Blob([text], { type: "text/csv" }));
  a.download = "result.csv"; a.click();
  URL.revokeObjectURL(a.href);
}
// query history: last 20 statements in localStorage
function loadHistory() {
  let h = [];
  try { h = JSON.parse(localStorage.getItem("graft_history") || "[]"); } catch (e) {}
  const sel = $("hist");
  sel.innerHTML = "<option value=''>history…</option>";
  h.forEach((q, i) => {
    const o = document.createElement("option");
    o.value = String(i); o.textContent = q.slice(0, 60).replace(/\s+/g, " ");
    sel.appendChild(o);
  });
  return h;
}
function pushHistory(sql) {
  let h = [];
  try { h = JSON.parse(localStorage.getItem("graft_history") || "[]"); } catch (e) {}
  h = [sql].concat(h.filter(q => q !== sql)).slice(0, 20);
  try { localStorage.setItem("graft_history", JSON.stringify(h)); } catch (e) {}
  loadHistory();
}
$("hist").addEventListener("change", () => {
  const h = loadHistory();
  const v = $("hist").value;
  if (v !== "" && h[Number(v)] !== undefined) $("sql").value = h[Number(v)];
  $("hist").value = "";
});
$("run").addEventListener("click", () => { pushHistory($("sql").value.trim()); run(); });
$("chart").addEventListener("click", () => { pushHistory($("sql").value.trim()); runChart(); });
$("csv").addEventListener("click", downloadCsv);
$("sql").addEventListener("keydown", e => {
  if (e.key === "Enter" && (e.ctrlKey || e.metaKey)) {
    e.preventDefault(); pushHistory($("sql").value.trim()); run();
  }
});
loadHistory();
</script>
</body>
</html>
"""
}
