"""Ops dashboard (reference duckdb-api-service/dashboard.html — a static
monitoring page polling the Prometheus endpoint every 5 s).

Served at ``GET /dashboard``: one self-contained HTML page, zero external
assets (the reference pulls chart.js from a CDN; this container is
offline, so the charts are inline SVG/DOM built from the same
``/metrics`` text the reference's page parses). Data sources: ``/metrics``
(request counters + latency summaries + uptime), ``/health`` (Spark
version / project count), ``/operations`` (recent ops log; degrades
gracefully when auth is required).

Visual system: single-hue sequential bars (magnitude), status palette
with icon + label chips (state is never color-alone), stat-tile KPI row,
client-side request-rate sparkline from successive polls; light/dark via
``prefers-color-scheme`` plus an explicit toggle.
"""

from __future__ import annotations

DASHBOARD_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="UTF-8">
<meta name="viewport" content="width=device-width, initial-scale=1.0">
<title>Storage Engine Dashboard</title>
<style>
:root {
  color-scheme: light;
  --surface-1: #fcfcfb; --page: #f9f9f7;
  --text-primary: #0b0b0b; --text-secondary: #52514e; --text-muted: #898781;
  --grid: #e1e0d9; --baseline: #c3c2b7; --border: rgba(11,11,11,0.10);
  --seq-blue: #2a78d6; --seq-orange: #eb6834;
  --good: #0ca30c; --serious: #ec835a; --critical: #d03b3b;
  --delta-good: #006300;
}
:root[data-theme="dark"] {
  color-scheme: dark;
  --surface-1: #1a1a19; --page: #0d0d0d;
  --text-primary: #ffffff; --text-secondary: #c3c2b7; --text-muted: #898781;
  --grid: #2c2c2a; --baseline: #383835; --border: rgba(255,255,255,0.10);
  --seq-blue: #3987e5; --seq-orange: #d95926;
  --delta-good: #0ca30c;
}
@media (prefers-color-scheme: dark) {
  :root:not([data-theme="light"]) {
    color-scheme: dark;
    --surface-1: #1a1a19; --page: #0d0d0d;
    --text-primary: #ffffff; --text-secondary: #c3c2b7; --text-muted: #898781;
    --grid: #2c2c2a; --baseline: #383835; --border: rgba(255,255,255,0.10);
    --seq-blue: #3987e5; --seq-orange: #d95926;
    --delta-good: #0ca30c;
  }
}
* { margin: 0; padding: 0; box-sizing: border-box; }
body {
  font-family: system-ui, -apple-system, "Segoe UI", sans-serif;
  background: var(--page); color: var(--text-secondary);
  min-height: 100vh; padding: 20px;
}
.header { display: flex; justify-content: space-between; align-items: center;
  flex-wrap: wrap; gap: 12px; padding-bottom: 14px; margin-bottom: 18px;
  border-bottom: 1px solid var(--grid); }
.header h1 { font-size: 20px; font-weight: 600; color: var(--text-primary); }
.badge { border: 1px solid var(--border); border-radius: 12px; padding: 3px 10px;
  font-size: 11px; color: var(--text-muted); }
.status-dot { display: inline-block; width: 9px; height: 9px; border-radius: 50%;
  background: var(--good); margin-right: 6px; vertical-align: baseline; }
.status-dot.down { background: var(--critical); }
.controls button { background: none; border: 1px solid var(--border);
  color: var(--text-primary); border-radius: 6px; padding: 5px 12px;
  font-size: 12px; cursor: pointer; }
.controls button:hover { border-color: var(--baseline); }
.controls label { font-size: 12px; color: var(--text-muted); margin-right: 10px; }
#errorBanner { display: none; border: 1px solid var(--critical);
  border-radius: 8px; padding: 8px 12px; margin-bottom: 14px; font-size: 13px;
  color: var(--text-primary); }
.tiles { display: grid; grid-template-columns: repeat(auto-fit, minmax(170px, 1fr));
  gap: 12px; margin-bottom: 18px; }
.tile { background: var(--surface-1); border: 1px solid var(--border);
  border-radius: 10px; padding: 14px 16px; }
.tile .label { font-size: 12px; color: var(--text-muted); margin-bottom: 6px; }
.tile .value { font-size: 28px; font-weight: 600; color: var(--text-primary); }
.tile .sub { font-size: 11px; color: var(--text-muted); margin-top: 4px; }
.tile svg { display: block; margin-top: 8px; }
.grid2 { display: grid; grid-template-columns: repeat(auto-fit, minmax(340px, 1fr));
  gap: 12px; margin-bottom: 18px; }
.card { background: var(--surface-1); border: 1px solid var(--border);
  border-radius: 10px; padding: 14px 16px; }
.card h2 { font-size: 13px; font-weight: 600; color: var(--text-primary);
  margin-bottom: 12px; }
.chips { display: flex; gap: 8px; flex-wrap: wrap; }
.chip { display: flex; align-items: center; gap: 6px; font-size: 12px;
  border: 1px solid var(--border); border-radius: 8px; padding: 6px 10px;
  color: var(--text-primary); }
.chip .n { font-weight: 600; }
.barrow { display: grid; grid-template-columns: minmax(120px, 38%) 1fr 64px;
  align-items: center; gap: 8px; margin-bottom: 2px; padding: 2px 0;
  border-radius: 4px; }
.barrow:hover { background: color-mix(in srgb, var(--baseline) 18%, transparent); }
.barrow .rlabel { font-size: 12px; color: var(--text-secondary);
  overflow: hidden; text-overflow: ellipsis; white-space: nowrap;
  direction: rtl; text-align: left; }
.barrow .track { height: 16px; position: relative; }
.barrow .bar { position: absolute; left: 0; top: 0; bottom: 0;
  border-radius: 0 4px 4px 0; min-width: 2px; }
.barrow .rvalue { font-size: 12px; color: var(--text-muted); text-align: right;
  font-variant-numeric: tabular-nums; }
table { width: 100%; border-collapse: collapse; font-size: 12px; }
th { text-align: left; color: var(--text-muted); font-weight: 500;
  border-bottom: 1px solid var(--grid); padding: 4px 8px 6px 0; }
td { padding: 5px 8px 5px 0; border-bottom: 1px solid var(--grid);
  color: var(--text-secondary); font-variant-numeric: tabular-nums; }
td.ok { color: var(--delta-good); }
td.err { color: var(--critical); }
.footer { font-size: 11px; color: var(--text-muted); }
#tooltip { position: fixed; display: none; pointer-events: none; z-index: 10;
  background: var(--surface-1); border: 1px solid var(--border);
  border-radius: 6px; padding: 6px 10px; font-size: 12px;
  color: var(--text-primary); box-shadow: 0 2px 8px rgba(0,0,0,0.18); }
</style>
</head>
<body>
<div class="header">
  <div style="display:flex;align-items:center;gap:12px">
    <h1>Storage Engine</h1>
    <span class="badge" id="versionBadge">…</span>
    <span style="font-size:12px"><span class="status-dot" id="statusDot"></span>
      <span id="statusText">connecting…</span></span>
  </div>
  <div class="controls">
    <label><input type="checkbox" id="autoRefresh" checked> auto-refresh 5s</label>
    <button onclick="refresh()">Refresh</button>
    <button onclick="toggleTheme()" id="themeBtn">Dark</button>
    <span class="badge" id="lastUpdate"></span>
  </div>
</div>
<div id="errorBanner"></div>
<div class="tiles">
  <div class="tile"><div class="label">Requests</div>
    <div class="value" id="tReq">–</div>
    <div class="sub" id="tReqRate"></div>
    <svg id="spark" width="140" height="28" role="img" aria-label="request rate sparkline"></svg></div>
  <div class="tile"><div class="label">Errors (4xx + 5xx)</div>
    <div class="value" id="tErr">–</div><div class="sub" id="tErrPct"></div></div>
  <div class="tile"><div class="label">Avg latency</div>
    <div class="value" id="tLat">–</div><div class="sub">all routes, lifetime</div></div>
  <div class="tile"><div class="label">Uptime</div>
    <div class="value" id="tUp">–</div><div class="sub" id="tProjects"></div></div>
</div>
<div class="grid2">
  <div class="card"><h2>Requests by route</h2><div id="reqBars"></div></div>
  <div class="card"><h2>Avg latency by route (ms)</h2><div id="latBars"></div></div>
</div>
<div class="grid2">
  <div class="card"><h2>Responses by status</h2><div class="chips" id="statusChips"></div></div>
  <div class="card"><h2>Recent operations</h2><div id="opsTable">
    <span class="footer">loading…</span></div></div>
</div>
<div class="footer">Polls <code>/metrics</code> (Prometheus text) +
  <code>/health</code> + <code>/operations</code>. Counters are
  process-lifetime; the rate sparkline is computed client-side between
  polls.</div>
<div id="tooltip"></div>
<script>
"use strict";
let timer = null, rateHistory = [], lastTotal = null, lastPoll = null;

function parseMetrics(text) {
  const out = {};
  for (const line of text.split("\\n")) {
    if (!line || line.startsWith("#")) continue;
    const m = line.match(/^(\\w+)(?:\\{(.*)\\})?\\s+(.+)$/);
    if (!m) continue;
    const labels = {};
    if (m[2]) for (const kv of m[2].match(/\\w+="[^"]*"/g) || []) {
      const i = kv.indexOf("=");
      labels[kv.slice(0, i)] = kv.slice(i + 2, -1);
    }
    (out[m[1]] = out[m[1]] || []).push({labels, value: parseFloat(m[3])});
  }
  return out;
}

function fmt(n) {
  if (n >= 1e6) return (n / 1e6).toFixed(1) + "M";
  if (n >= 1e4) return (n / 1e3).toFixed(1) + "K";
  return n.toLocaleString("en-US");
}
function fmtDur(s) {
  if (s >= 86400) return (s / 86400).toFixed(1) + "d";
  if (s >= 3600) return (s / 3600).toFixed(1) + "h";
  if (s >= 60) return Math.floor(s / 60) + "m " + Math.floor(s % 60) + "s";
  return s.toFixed(0) + "s";
}

const tooltip = document.getElementById("tooltip");
function showTip(e, html) {
  tooltip.innerHTML = html; tooltip.style.display = "block";
  tooltip.style.left = Math.min(e.clientX + 12, innerWidth - 180) + "px";
  tooltip.style.top = (e.clientY + 12) + "px";
}
function hideTip() { tooltip.style.display = "none"; }

function barRows(el, rows, colorVar, fmtVal, tipFn) {
  // horizontal bars: sequential single hue, 4px rounded data-end,
  // value at the tip in muted ink, per-mark hover tooltip
  const max = Math.max(...rows.map(r => r.v), 1e-9);
  el.innerHTML = "";
  for (const r of rows) {
    const row = document.createElement("div");
    row.className = "barrow";
    const pct = Math.max(100 * r.v / max, 0.5);
    row.innerHTML =
      `<span class="rlabel" title="${r.k}">&#x200E;${r.k}</span>` +
      `<span class="track"><span class="bar" style="width:${pct}%;` +
      `background:var(${colorVar})"></span></span>` +
      `<span class="rvalue">${fmtVal(r.v)}</span>`;
    row.addEventListener("mousemove", e => showTip(e, tipFn(r)));
    row.addEventListener("mouseleave", hideTip);
    el.appendChild(row);
  }
  if (!rows.length) el.innerHTML = '<span class="footer">no traffic yet</span>';
}

function drawSpark(values) {
  const svg = document.getElementById("spark");
  const w = 140, h = 28, pad = 2;
  if (values.length < 2) { svg.innerHTML = ""; return; }
  const max = Math.max(...values, 1e-9);
  const pts = values.map((v, i) =>
    [pad + i * (w - 2 * pad) / (values.length - 1),
     h - pad - (h - 2 * pad) * v / max]);
  const d = pts.map((p, i) => (i ? "L" : "M") + p[0].toFixed(1) + "," + p[1].toFixed(1)).join(" ");
  const last = pts[pts.length - 1];
  svg.innerHTML =
    `<path d="${d}" fill="none" stroke="var(--baseline)" stroke-width="2"` +
    ` stroke-linejoin="round" stroke-linecap="round"/>` +
    `<circle cx="${last[0]}" cy="${last[1]}" r="4" fill="var(--seq-blue)"` +
    ` stroke="var(--surface-1)" stroke-width="2"/>`;
}

const STATUS_META = [
  ["2", "var(--good)", "&#10003;", "2xx ok"],
  ["3", "var(--seq-blue)", "&#8635;", "3xx redirect"],
  ["4", "var(--serious)", "&#9888;", "4xx client error"],
  ["5", "var(--critical)", "&#10007;", "5xx server error"],
];

async function refresh() {
  try {
    const mResp = await fetch("metrics");
    if (!mResp.ok) throw new Error("HTTP " + mResp.status);
    const m = parseMetrics(await mResp.text());

    const reqs = m["storage_http_requests_total"] || [];
    const total = reqs.reduce((a, r) => a + r.value, 0);
    const errs = reqs.filter(r => +r.labels.status >= 400)
                     .reduce((a, r) => a + r.value, 0);
    document.getElementById("tReq").textContent = fmt(total);
    document.getElementById("tErr").textContent = fmt(errs);
    document.getElementById("tErrPct").textContent =
      total ? (100 * errs / total).toFixed(1) + "% of requests" : "";

    const now = Date.now() / 1000;
    if (lastTotal !== null && now > lastPoll) {
      rateHistory.push(Math.max(0, (total - lastTotal) / (now - lastPoll)));
      if (rateHistory.length > 12) rateHistory.shift();
      const cur = rateHistory[rateHistory.length - 1];
      document.getElementById("tReqRate").textContent =
        cur.toFixed(1) + " req/s";
    }
    lastTotal = total; lastPoll = now;
    drawSpark(rateHistory);

    const lsum = m["storage_http_request_seconds_sum"] || [];
    const lcnt = m["storage_http_request_seconds_count"] || [];
    const cntBy = {};
    for (const r of lcnt) cntBy[r.labels.method + " " + r.labels.route] = r.value;
    const sumAll = lsum.reduce((a, r) => a + r.value, 0);
    const cntAll = lcnt.reduce((a, r) => a + r.value, 0);
    document.getElementById("tLat").textContent =
      cntAll ? (1000 * sumAll / cntAll).toFixed(0) + "ms" : "–";

    const up = (m["storage_uptime_seconds"] || [])[0];
    if (up) document.getElementById("tUp").textContent = fmtDur(up.value);

    // requests by route (top 10 + fold)
    const byRoute = {};
    for (const r of reqs) {
      const k = r.labels.method + " " + r.labels.route;
      byRoute[k] = (byRoute[k] || 0) + r.value;
    }
    let rows = Object.entries(byRoute).map(([k, v]) => ({k, v}))
      .sort((a, b) => b.v - a.v);
    if (rows.length > 10) {
      const other = rows.slice(10).reduce((a, r) => a + r.v, 0);
      rows = rows.slice(0, 10);
      rows.push({k: "other (" + (Object.keys(byRoute).length - 10) + " routes)",
                 v: other});
    }
    barRows(document.getElementById("reqBars"), rows, "--seq-blue", fmt,
      r => `<b>${r.k}</b><br>${fmt(r.v)} requests`);

    // p95 per route interpolated from the cumulative histogram buckets
    const hist = {};
    for (const b of m["storage_http_request_seconds_hist_bucket"] || []) {
      const k = b.labels.method + " " + b.labels.route;
      (hist[k] = hist[k] || []).push(
        {le: b.labels.le === "+Inf" ? Infinity : parseFloat(b.labels.le),
         count: b.value});
    }
    function p95(buckets) {
      // returns {v, open}: open=true means the quantile fell in the
      // +Inf bucket — v is then a LOWER bound (p95 > v), not an upper
      const sorted = buckets.slice().sort((a, b) => a.le - b.le);
      const total = sorted[sorted.length - 1]?.count || 0;
      if (!total) return null;
      const target = 0.95 * total;
      let prev = {le: 0, count: 0};
      for (const b of sorted) {
        if (b.count >= target) {
          if (b.le === Infinity) return {v: prev.le, open: true};
          const ratio = (target - prev.count) / (b.count - prev.count || 1);
          return {v: prev.le + ratio * (b.le - prev.le), open: false};
        }
        prev = b;
      }
      return {v: sorted[sorted.length - 1]?.le, open: false};
    }

    // avg latency by route (top 10 by avg, min 1 request); p95 in tooltip
    let lat = lsum.map(r => {
      const k = r.labels.method + " " + r.labels.route;
      const q = hist[k] ? p95(hist[k]) : null;
      return {k, v: cntBy[k] ? 1000 * r.value / cntBy[k] : 0,
              n: cntBy[k] || 0, p95: q};
    }).filter(r => r.n > 0).sort((a, b) => b.v - a.v).slice(0, 10);
    barRows(document.getElementById("latBars"), lat, "--seq-orange",
      v => v.toFixed(1),
      r => `<b>${r.k}</b><br>avg ${r.v.toFixed(1)} ms over ${fmt(r.n)} requests`
           + (r.p95 === null ? "" : r.p95.open
              ? `<br>p95 &gt; ${(1000 * r.p95.v).toFixed(0)} ms (beyond the last bucket)`
              : `<br>p95 &le; ${(1000 * r.p95.v).toFixed(1)} ms`));

    // status chips: icon + label + count — state never reads by color alone
    const chips = document.getElementById("statusChips");
    chips.innerHTML = "";
    for (const [prefix, color, icon, label] of STATUS_META) {
      const n = reqs.filter(r => r.labels.status[0] === prefix)
                    .reduce((a, r) => a + r.value, 0);
      if (!n && prefix !== "2") continue;
      const c = document.createElement("span");
      c.className = "chip";
      c.innerHTML = `<span style="color:${color}">${icon}</span>` +
                    `<span>${label}</span><span class="n">${fmt(n)}</span>`;
      chips.appendChild(c);
    }

    document.getElementById("statusDot").classList.remove("down");
    document.getElementById("statusText").textContent = "connected";
    document.getElementById("errorBanner").style.display = "none";
    document.getElementById("lastUpdate").textContent =
      new Date().toLocaleTimeString();
  } catch (err) {
    document.getElementById("statusDot").classList.add("down");
    document.getElementById("statusText").textContent = "disconnected";
    const b = document.getElementById("errorBanner");
    b.textContent = "Failed to fetch metrics: " + err.message;
    b.style.display = "block";
  }
  try {
    const h = await (await fetch("health")).json();
    document.getElementById("versionBadge").textContent =
      "Spark " + h.spark;
    document.getElementById("tProjects").textContent =
      h.projects + " project" + (h.projects === 1 ? "" : "s");
  } catch (err) { /* health optional */ }
  try {
    const resp = await fetch("operations?limit=12");
    const el = document.getElementById("opsTable");
    if (resp.ok) {
      const ops = await resp.json();
      if (!ops.length) { el.innerHTML = '<span class="footer">no operations yet</span>'; }
      else {
        el.innerHTML = "<table><tr><th>time</th><th>operation</th>" +
          "<th>target</th><th>status</th></tr>" +
          ops.slice(-12).reverse().map(o =>
            `<tr><td>${o.ts ? new Date(1000 * o.ts).toLocaleTimeString() : ""}</td>` +
            `<td>${o.op || o.operation || ""}</td>` +
            `<td>${[o.project, o.bucket, o.table].filter(Boolean).join("/")}</td>` +
            `<td class="${o.error ? "err" : "ok"}">${o.error ? "error" : "ok"}</td></tr>`
          ).join("") + "</table>";
      }
    } else {
      el.innerHTML = '<span class="footer">operations log requires an API key' +
        " (HTTP " + resp.status + ")</span>";
    }
  } catch (err) { /* operations optional */ }
}

function toggleTheme() {
  const root = document.documentElement;
  const dark = root.getAttribute("data-theme") === "dark" ||
    (!root.getAttribute("data-theme") &&
     matchMedia("(prefers-color-scheme: dark)").matches);
  root.setAttribute("data-theme", dark ? "light" : "dark");
  document.getElementById("themeBtn").textContent = dark ? "Dark" : "Light";
}

document.getElementById("autoRefresh").addEventListener("change", function () {
  if (this.checked) timer = setInterval(refresh, 5000);
  else { clearInterval(timer); timer = null; }
});
refresh();
timer = setInterval(refresh, 5000);
</script>
</body>
</html>
"""
