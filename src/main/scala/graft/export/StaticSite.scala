package graft.export

import graft.catalog.Catalog
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Path, Paths}

/** Full static catalog site — the re-expression of the reference's
  * `export_and_generate_site` (export/web.py:119-150), which writes
  * `data.json` and copies a precompiled JS bundle
  * (static_site/build.py:56). Instead of a prebuilt npm artifact this
  * emits a self-contained, dependency-free site: the same `data.json`
  * payload ([[WebExport]]) plus an `index.html` whose embedded
  * renderer gives the browsing essentials of the reference site —
  * catalog → database → table navigation, column/partition schema
  * tables, docs metadata, and the two interactive features the
  * reference builds on npm dependencies, re-expressed dependency-free:
  *  - FUZZY search over databases, tables, columns and partitions
  *    (subsequence match with word-start/contiguity scoring standing
  *    in for fuse.js; column/partition hits surface their table,
  *    annotated with the matching member — static_site/src/lib/
  *    fuzzy-search.ts behavior),
  *  - a per-table USAGE SNIPPET with partition-derived example
  *    filters, syntax-highlighted by a small tokenizer (standing in
  *    for shiki; static_site/src/lib/codegen.ts behavior) — emitted
  *    in the Scala `table(spark, ReadArgs.where(Filter(...)))` form
  *    this engine's API uses, in both Filter-algebra and raw-SQL-
  *    predicate flavors.
  */
object StaticSite {

  /** Write `data.json`, `index.html`, `styles.css` into `outputDir`;
    * returns the index path. The site is fully static — serve the
    * directory with any file server (the renderer fetches data.json,
    * so a bare file:// open is blocked by browser CORS rules — same
    * constraint as the reference's vite bundle).
    */
  def generate(
      catalogs: Seq[(String, Catalog)],
      outputDir: String,
      spark: SparkSession
  ): Path = {
    WebExport.writeDataJson(catalogs, outputDir, spark)
    val dir = Paths.get(outputDir)
    Files.writeString(dir.resolve("styles.css"), Css)
    val index = dir.resolve("index.html")
    Files.writeString(index, IndexHtml)
    index
  }

  // The renderer walks exactly the data.json schema WebExport emits:
  // {catalogs: [{name, databases: [{name, tables: [{name, columns,
  // partitions, table_type, description, ...}]}]}]}.
  private val IndexHtml: String =
    """<!doctype html>
      |<html lang="en">
      |<head>
      |<meta charset="utf-8"/>
      |<meta name="viewport" content="width=device-width, initial-scale=1"/>
      |<title>Data Catalog</title>
      |<link rel="stylesheet" href="styles.css"/>
      |</head>
      |<body>
      |<div id="app">
      |  <aside id="nav">
      |    <h1>Data Catalog</h1>
      |    <input id="search" type="search" placeholder="filter tables&hellip;" autocomplete="off"/>
      |    <nav id="tree"></nav>
      |  </aside>
      |  <main id="detail"><p class="hint">Select a table.</p></main>
      |</div>
      |<script>
      |"use strict";
      |function el(tag, cls, text) {
      |  var e = document.createElement(tag);
      |  if (cls) e.className = cls;
      |  if (text !== undefined && text !== null) e.textContent = String(text);
      |  return e;
      |}
      |// ---- fuzzy subsequence match: every query char must appear in
      |// order; score rewards word starts and contiguous runs (the
      |// ranking essentials of the reference's fuse.js index)
      |function fuzzyScore(query, target) {
      |  var q = query.toLowerCase(), t = target.toLowerCase();
      |  var qi = 0, score = 0, run = 0;
      |  for (var ti = 0; ti < t.length && qi < q.length; ti++) {
      |    if (t[ti] === q[qi]) {
      |      run += 1;
      |      score += run; // contiguous runs compound
      |      if (ti === 0 || t[ti - 1] === "_" || t[ti - 1] === ".") score += 3;
      |      qi += 1;
      |    } else run = 0;
      |  }
      |  if (qi < q.length) return -1; // not a subsequence
      |  return score - 0.01 * t.length; // shorter targets win ties
      |}
      |// ---- usage-snippet codegen (reference codegen.ts behavior, in
      |// this engine's Scala API) + a tiny class-based highlighter
      |function rawExample(p) {
      |  var v = p.value === undefined || p.value === null || p.value === "" ? null : p.value;
      |  var str = (p.type_annotation || "").toLowerCase().indexOf("str") >= 0;
      |  return { v: v, str: str };
      |}
      |// each flavor escapes for ITS quoting, so a value holding a quote
      |// or backslash still renders a copy-paste-valid snippet
      |function exampleValue(p) {
      |  var r = rawExample(p);
      |  if (r.v === null) return r.str ? "\"...\"" : "...";
      |  if (!r.str) return String(r.v);
      |  return "\"" + String(r.v).replace(/\\/g, "\\\\").replace(/"/g, "\\\"") + "\"";
      |}
      |function sqlExampleValue(p) {
      |  var r = rawExample(p);
      |  if (r.v === null) return r.str ? "'...'" : "...";
      |  return r.str ? "'" + String(r.v).replace(/'/g, "''") + "'" : String(r.v);
      |}
      |function genCode(cat, db, t, sqlFlavor) {
      |  var parts = t.partitions || [];
      |  var lines = ["import graft.core.Filter", "import graft.tables.ReadArgs", ""];
      |  var call = "val df = catalog(\"" + cat + "\").database(\"" + db + "\")\n" +
      |    "  .table(\"" + t.name + "\")(spark, ";
      |  if (!parts.length) {
      |    lines.push(call + "ReadArgs.empty)");
      |  } else if (sqlFlavor) {
      |    var pred = parts.map(function (p) {
      |      return p.column_name + " = " + sqlExampleValue(p);
      |    }).join(" and ");
      |    // the predicate is spliced into a Scala string literal in the
      |    // snippet, so escape for THAT layer as well
      |    var scalaPred = pred.replace(/\\/g, "\\\\").replace(/"/g, "\\\"");
      |    lines.push(call + "ReadArgs(extra = Map(\n    \"predicate\" -> \"" + scalaPred + "\")))");
      |  } else {
      |    var fs = parts.map(function (p) {
      |      return "    Filter(\"" + p.column_name + "\", \"=\", " + exampleValue(p) + ")";
      |    });
      |    lines.push(call + "ReadArgs.where(\n" + fs.join(",\n") + "))");
      |  }
      |  return lines.join("\n");
      |}
      |var ScalaKw = /^(val|import|spark)$/;
      |function highlight(code) {
      |  var pre = el("pre", "code");
      |  code.split(/(\"[^\"]*\"|[A-Za-z_][A-Za-z0-9_]*|\s+|.)/).forEach(function (tok) {
      |    if (!tok) return;
      |    var cls = null;
      |    if (tok[0] === "\"") cls = "s";
      |    else if (ScalaKw.test(tok)) cls = "k";
      |    else if (/^[A-Z]/.test(tok)) cls = "t";
      |    else if (/^[0-9]/.test(tok)) cls = "n";
      |    pre.appendChild(cls ? el("span", cls, tok) : document.createTextNode(tok));
      |  });
      |  return pre;
      |}
      |// ArrowTypeView re-expressed: parse the Spark type grammar
      |// (struct<a:t,...>, array<t>, map<k,v>, decimal(p,s), plain) and
      |// render nested types as an expandable tree instead of one long
      |// string (static_site/src/components/ArrowTypeView.tsx behavior).
      |function splitTop(s) {
      |  var out = [], d = 0, cur = "";
      |  for (var i = 0; i < s.length; i++) {
      |    var c = s[i];
      |    if (c === "<" || c === "(") d++;
      |    if (c === ">" || c === ")") d--;
      |    if (c === "," && d === 0) { out.push(cur); cur = ""; } else cur += c;
      |  }
      |  if (cur) out.push(cur);
      |  return out;
      |}
      |function typeView(t) {
      |  t = (t || "").trim();
      |  var m = t.match(/^(struct|array|map)<(.*)>$/);
      |  if (!m) return el("span", "ty-leaf", t);
      |  var box = el("details", "ty-node");
      |  box.appendChild(el("summary", "ty-kind", m[1]));
      |  var ul = el("ul", "ty-kids");
      |  splitTop(m[2]).forEach(function (part, i) {
      |    var li = el("li");
      |    if (m[1] === "struct") {
      |      var k = part.indexOf(":");
      |      li.appendChild(el("span", "ty-name", part.slice(0, k).trim() + ": "));
      |      li.appendChild(typeView(part.slice(k + 1)));
      |    } else if (m[1] === "map") {
      |      li.appendChild(el("span", "ty-name", i === 0 ? "key: " : "value: "));
      |      li.appendChild(typeView(part));
      |    } else {
      |      li.appendChild(typeView(part));
      |    }
      |    ul.appendChild(li);
      |  });
      |  box.appendChild(ul);
      |  return box;
      |}
      |function renderTable(cat, db, t) {
      |  var d = document.getElementById("detail");
      |  d.innerHTML = "";
      |  var head = el("div", "t-head");
      |  head.appendChild(el("h2", null, cat + "." + db + "." + t.name));
      |  head.appendChild(el("span", "badge", t.table_type));
      |  d.appendChild(head);
      |  if (t.description) d.appendChild(el("p", "desc", t.description));
      |  d.appendChild(el("h3", null, "Usage"));
      |  d.appendChild(highlight(genCode(cat, db, t, false)));
      |  if (t.table_type === "DELTA_LAKE") {
      |    d.appendChild(el("p", "meta", "SQL-predicate flavor:"));
      |    d.appendChild(highlight(genCode(cat, db, t, true)));
      |  }
      |  if (t.latency_info) d.appendChild(el("p", "meta", "Latency: " + t.latency_info));
      |  if (t.data_input) d.appendChild(el("p", "meta", "Input: " + t.data_input));
      |  if (t.partitions && t.partitions.length) {
      |    d.appendChild(el("h3", null, "Partitions"));
      |    var pt = el("table", "schema");
      |    var ph = el("tr"); ["column", "type"].forEach(function (h) { ph.appendChild(el("th", null, h)); });
      |    pt.appendChild(ph);
      |    t.partitions.forEach(function (p) {
      |      var r = el("tr");
      |      r.appendChild(el("td", null, p.column_name));
      |      r.appendChild(el("td", null, p.type_annotation));
      |      pt.appendChild(r);
      |    });
      |    d.appendChild(pt);
      |  }
      |  d.appendChild(el("h3", null, "Columns"));
      |  var ct = el("table", "schema");
      |  var ch = el("tr");
      |  ["column", "type", "flags"].forEach(function (h) { ch.appendChild(el("th", null, h)); });
      |  ct.appendChild(ch);
      |  (t.columns || []).forEach(function (c) {
      |    var r = el("tr");
      |    r.appendChild(el("td", null, c.column));
      |    var tdT = el("td", "type");
      |    tdT.appendChild(typeView(c.type));
      |    r.appendChild(tdT);
      |    var flags = [];
      |    if (c.readonly) flags.push("readonly");
      |    if (c.filter_only) flags.push("filter-only");
      |    if (c.has_stats) flags.push("stats");
      |    r.appendChild(el("td", "flags", flags.join(", ")));
      |    ct.appendChild(r);
      |  });
      |  d.appendChild(ct);
      |}
      |// a table is shown when the query fuzzy-matches db.table OR any
      |// column/partition name (column hits annotated, like the
      |// reference's segmented database/table + column/partition index)
      |function tableMatch(dbName, t, query) {
      |  if (!query) return { show: true, note: null };
      |  var best = fuzzyScore(query, dbName + "." + t.name);
      |  var note = null;
      |  (t.columns || []).concat(t.partitions || []).forEach(function (c) {
      |    var n = c.column || c.column_name;
      |    var s = fuzzyScore(query, n);
      |    if (s >= 0 && s > best) { best = s; note = n; }
      |  });
      |  return { show: best >= 0, note: note };
      |}
      |function buildTree(data, filter) {
      |  var tree = document.getElementById("tree");
      |  tree.innerHTML = "";
      |  (data.catalogs || []).forEach(function (cat) {
      |    var catEl = el("div", "cat");
      |    catEl.appendChild(el("div", "cat-name", cat.name));
      |    (cat.databases || []).forEach(function (db) {
      |      var dbEl = el("div", "db");
      |      dbEl.appendChild(el("div", "db-name", db.name));
      |      var any = false;
      |      (db.tables || []).forEach(function (t) {
      |        var m = tableMatch(db.name, t, filter);
      |        if (!m.show) return;
      |        any = true;
      |        var a = el("a", "tbl", t.name);
      |        if (m.note) a.appendChild(el("span", "col-hit", " · " + m.note));
      |        a.href = "#" + cat.name + "." + db.name + "." + t.name;
      |        a.onclick = function () { renderTable(cat.name, db.name, t); };
      |        dbEl.appendChild(a);
      |      });
      |      if (any || !filter) catEl.appendChild(dbEl);
      |    });
      |    tree.appendChild(catEl);
      |  });
      |}
      |fetch("data.json").then(function (r) { return r.json(); }).then(function (data) {
      |  buildTree(data, "");
      |  document.getElementById("search").addEventListener("input", function (e) {
      |    buildTree(data, e.target.value.trim());
      |  });
      |  var h = decodeURIComponent(location.hash.slice(1));
      |  if (h) {
      |    var parts = h.split(".");
      |    (data.catalogs || []).forEach(function (cat) {
      |      if (cat.name !== parts[0]) return;
      |      (cat.databases || []).forEach(function (db) {
      |        if (db.name !== parts[1]) return;
      |        (db.tables || []).forEach(function (t) {
      |          if (t.name === parts[2]) renderTable(cat.name, db.name, t);
      |        });
      |      });
      |    });
      |  }
      |});
      |</script>
      |</body>
      |</html>
      |""".stripMargin

  private val Css: String =
    """:root { --fg: #1a1a1a; --muted: #666; --line: #e2e2e2; --accent: #0b5fff; }
      |* { box-sizing: border-box; }
      |body { margin: 0; font: 14px/1.5 system-ui, sans-serif; color: var(--fg); }
      |#app { display: flex; min-height: 100vh; }
      |#nav { width: 280px; border-right: 1px solid var(--line); padding: 16px; }
      |#nav h1 { font-size: 16px; margin: 0 0 12px; }
      |#search { width: 100%; padding: 6px 8px; margin-bottom: 12px; }
      |.cat-name { font-weight: 600; margin-top: 10px; }
      |.db { margin-left: 8px; }
      |.db-name { color: var(--muted); margin-top: 6px; }
      |a.tbl { display: block; margin-left: 12px; padding: 2px 4px; color: var(--accent);
      |        text-decoration: none; border-radius: 4px; }
      |a.tbl:hover { background: #f0f4ff; }
      |main { flex: 1; padding: 24px; }
      |.t-head { display: flex; align-items: center; gap: 10px; }
      |.badge { background: #eef; border: 1px solid var(--line); border-radius: 10px;
      |         padding: 1px 10px; font-size: 12px; }
      |.desc { color: var(--muted); }
      |.meta { font-size: 13px; color: var(--muted); margin: 2px 0; }
      |table.schema { border-collapse: collapse; margin-top: 8px; }
      |table.schema th, table.schema td { border: 1px solid var(--line);
      |  padding: 4px 10px; text-align: left; }
      |table.schema th { background: #fafafa; }
      |td.type { font-family: ui-monospace, monospace; font-size: 13px; }
      |td.flags { color: var(--muted); font-size: 12px; }
      |details.ty-node summary { cursor: pointer; color: #8250df; }
      |ul.ty-kids { margin: 2px 0 2px 14px; padding: 0; list-style: none; }
      |.ty-name { color: var(--muted); }
      |.ty-leaf { color: #0550ae; }
      |.hint { color: var(--muted); }
      |.col-hit { color: var(--muted); font-size: 12px; }
      |pre.code { background: #f6f8fa; border: 1px solid var(--line); border-radius: 6px;
      |  padding: 10px 12px; font: 13px/1.5 ui-monospace, monospace; overflow-x: auto; }
      |pre.code .k { color: #cf222e; }
      |pre.code .s { color: #0a3069; }
      |pre.code .t { color: #8250df; }
      |pre.code .n { color: #0550ae; }
      |""".stripMargin
}
