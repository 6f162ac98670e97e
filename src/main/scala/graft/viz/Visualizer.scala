package graft.viz

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Interactive graph visualizer — the Spark-native analog of the reference's
  * `visualization/visualizer.py:18-97` (pyvis `Network` + seaborn `hls`
  * palette over the Leiden partition of one graph level).
  *
  * Split the same way the reference splits it, but with the data work
  * distributed and only the final small render on the driver:
  *
  *  1. [[visualData]] — DataFrame-side: slice one level, compute each node's
  *     degree (`value=len(nd.edges)` in the reference) from the exploded
  *     edge-endpoint stream (one shuffle, no self-join), and keep only edges
  *     whose BOTH endpoints sit at the level (the reference gathers
  *     `node.edges` of the level's nodes). The level slice is capped at
  *     `maxNodes` by (degree desc, name) — an HTML page with millions of DOM
  *     nodes is unusable and uncollectable, so the cap is the documented
  *     100 TB guard; the reference has no such guard because it never leaves
  *     one process.
  *  2. [[renderHtml]] — driver-side over the bounded collected rows: assign
  *     each community an evenly-spaced HLS hue (the deterministic twin of
  *     `sns.color_palette("hls", len(comms))`, indexed by sorted
  *     community_id instead of partition-discovery order) and emit ONE
  *     self-contained HTML file: embedded JSON + a small seeded
  *     force-directed canvas layout + a node select menu (pyvis
  *     `select_menu=True`). No CDN fetch — the reference pulls vis-network
  *     remotely, which an offline cluster edge node cannot.
  *
  * Communities come from the build's own `community_id` column (G2/G3), so
  * no re-clustering happens here — unlike the reference, which re-runs
  * Leiden inside the visualizer on every call (`visualizer.py:34`).
  */
object Visualizer {

  /** Level slice + degree + level-internal edges, all DataFrame-side.
    * Returns (vizNodes, vizEdges):
    * vizNodes = (id, name, description, community_id, degree);
    * vizEdges = (frm, to, frm_name, to_name, description) — endpoint IDS
    * travel alongside the display names because level-0 names are NOT
    * unique across documents ("Acme Corp" in two docs = two nodes); the
    * render keys everything by id and uses the name only as a label. */
  def visualData(nodes: DataFrame, edges: DataFrame, level: Int = 0,
                 maxNodes: Int = 2000): (DataFrame, DataFrame) = {
    val lvl = nodes.filter(col("level") === level)
      .select(col("id"), col("name"), col("description"), col("community_id"))
    val degree = edges
      .select(explode(array(col("frm"), col("to"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val vn = lvl.join(degree, Seq("id"), "left")
      .withColumn("degree", coalesce(col("degree"), lit(0L)))
      .orderBy(col("degree").desc, col("name").asc, col("id").asc)
      .limit(maxNodes)
    // vn is bounded by maxNodes, so both endpoint joins broadcast it — the
    // edge table streams once, nothing corpus-sized shuffles.
    val ids = broadcast(vn.select(col("id"), col("name")))
    val ve = edges
      .join(ids.select(col("id").as("frm"), col("name").as("frm_name")), Seq("frm"))
      .join(ids.select(col("id").as("to"), col("name").as("to_name")), Seq("to"))
      .select(col("frm"), col("to"), col("frm_name"), col("to_name"), col("description"))
    (vn, ve)
  }

  /** `colorsys.hls_to_rgb` twin (what seaborn's "hls" palette calls), hex
    * output. seaborn defaults: l=0.6, s=0.65, hues evenly spaced. */
  private[graft] def hlsToHex(h: Double, l: Double = 0.6, s: Double = 0.65): String = {
    val m2 = if (l <= 0.5) l * (1.0 + s) else l + s - l * s
    val m1 = 2.0 * l - m2
    def v(hue: Double): Double = {
      val hh = ((hue % 1.0) + 1.0) % 1.0
      if (hh < 1.0 / 6.0) m1 + (m2 - m1) * hh * 6.0
      else if (hh < 0.5) m2
      else if (hh < 2.0 / 3.0) m1 + (m2 - m1) * (2.0 / 3.0 - hh) * 6.0
      else m1
    }
    def c(x: Double): Int = math.max(0, math.min(255, math.round(x * 255.0).toInt))
    f"#${c(v(h + 1.0 / 3.0))}%02x${c(v(h))}%02x${c(v(h - 1.0 / 3.0))}%02x"
  }

  private def jsonStr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case '<'  => b.append("\\u003c") // never form "</script>" inside the embed
      case ch if ch < ' ' => b.append(f"\\u${ch.toInt}%04x")
      case ch   => b.append(ch)
    }
    b.append('"').toString
  }

  /** Render the bounded collected rows to one self-contained HTML page.
    * Deterministic: palette index = sorted community_id rank; layout seeds
    * from a fixed PRNG seed; nodes/edges are emitted in sorted order.
    * Node identity is the node ID, never the display name — level-0 names
    * repeat across documents, and keying by name would collapse
    * same-named nodes and attach both documents' edges to one circle. */
  def renderHtml(vizNodes: Seq[Row], vizEdges: Seq[Row]): String = {
    val comms = vizNodes.map(_.getAs[String]("community_id")).distinct.sorted
    val n = math.max(1, comms.size)
    val color = comms.zipWithIndex.map { case (c, i) => c -> hlsToHex(i.toDouble / n) }.toMap
    val nodesJson = vizNodes
      .sortBy(r => (r.getAs[String]("name"), r.getAs[String]("id")))
      .map { r =>
        s"{\"id\":${jsonStr(r.getAs[String]("id"))}," +
          s"\"label\":${jsonStr(r.getAs[String]("name"))}," +
          s"\"title\":${jsonStr(Option(r.getAs[String]("description")).getOrElse(""))}," +
          s"\"value\":${r.getAs[Long]("degree")}," +
          s"\"color\":${jsonStr(color(r.getAs[String]("community_id")))}}"
      }.mkString("[", ",", "]")
    val edgesJson = vizEdges
      .map(r => (r.getAs[String]("frm"), r.getAs[String]("to"),
        Option(r.getAs[String]("description")).getOrElse("")))
      .sorted
      .map { case (f, t, d) =>
        s"{\"from\":${jsonStr(f)},\"to\":${jsonStr(t)},\"title\":${jsonStr(d)}}"
      }.mkString("[", ",", "]")
    s"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>graft graph</title>
<style>
 body{margin:0;font:13px sans-serif;background:#fff}
 #bar{padding:6px;border-bottom:1px solid #ddd}
 #cv{display:block}
 #tip{position:fixed;pointer-events:none;background:#222;color:#fff;padding:3px 6px;border-radius:3px;display:none;max-width:420px}
</style></head>
<body>
<div id="bar">Select a node: <select id="sel"><option value="">&#8212;</option></select></div>
<canvas id="cv"></canvas><div id="tip"></div>
<script>
const NODES=$nodesJson;
const EDGES=$edgesJson;
// mulberry32 - seeded, so the layout is reproducible run to run
let _s=42>>>0;function rnd(){_s|=0;_s=_s+0x6D2B79F5|0;let t=Math.imul(_s^_s>>>15,1|_s);t=t+Math.imul(t^t>>>7,61|t)^t;return((t^t>>>14)>>>0)/4294967296}
const cv=document.getElementById('cv'),cx=cv.getContext('2d');
let W=innerWidth,H=innerHeight-40;cv.width=W;cv.height=H;
const idx={};NODES.forEach((nd,i)=>{idx[nd.id]=i;nd.x=(rnd()-.5)*W*.8+W/2;nd.y=(rnd()-.5)*H*.8+H/2;nd.vx=0;nd.vy=0;nd.r=4+2*Math.sqrt(nd.value)});
const links=EDGES.filter(e=>e.from in idx&&e.to in idx).map(e=>({a:idx[e.from],b:idx[e.to],title:e.title}));
let sel=null;
// force-atlas-ish: repulsion + spring + central gravity (visualizer.py:94)
function step(){
 for(const p of NODES){p.fx=(W/2-p.x)*.015;p.fy=(H/2-p.y)*.015}
 for(let i=0;i<NODES.length;i++)for(let j=i+1;j<NODES.length;j++){
  const a=NODES[i],b=NODES[j];let dx=a.x-b.x,dy=a.y-b.y,d2=dx*dx+dy*dy+.01;
  if(d2<40000){const f=900/d2;a.fx+=dx*f;a.fy+=dy*f;b.fx-=dx*f;b.fy-=dy*f}}
 for(const l of links){const a=NODES[l.a],b=NODES[l.b];
  const dx=b.x-a.x,dy=b.y-a.y,d=Math.sqrt(dx*dx+dy*dy)+.01,f=.02*(d-60)/d;
  a.fx+=dx*f;a.fy+=dy*f;b.fx-=dx*f;b.fy-=dy*f}
 for(const p of NODES){p.vx=(p.vx+p.fx)*.6;p.vy=(p.vy+p.fy)*.6;p.x+=p.vx;p.y+=p.vy}
}
function draw(){
 cx.clearRect(0,0,W,H);cx.strokeStyle='#bbb';
 for(const l of links){const a=NODES[l.a],b=NODES[l.b];
  cx.beginPath();cx.moveTo(a.x,a.y);cx.lineTo(b.x,b.y);cx.stroke()}
 for(const p of NODES){cx.beginPath();cx.arc(p.x,p.y,p.r,0,7);
  cx.fillStyle=p.color;cx.fill();
  if(sel===p.id){cx.lineWidth=3;cx.strokeStyle='#000';cx.stroke();cx.lineWidth=1;cx.strokeStyle='#bbb'}
  cx.fillStyle='#333';cx.fillText(p.label,p.x+p.r+2,p.y+4)}
}
let ticks=0;(function loop(){step();draw();if(++ticks<300)requestAnimationFrame(loop)})();
const selEl=document.getElementById('sel');
for(const nd of NODES){const o=document.createElement('option');o.value=nd.id;o.textContent=nd.label;selEl.appendChild(o)}
selEl.onchange=()=>{sel=selEl.value||null;draw()};
const tip=document.getElementById('tip');
cv.onmousemove=e=>{const mx=e.clientX,my=e.clientY-40;let hit=null;
 for(const p of NODES){const dx=p.x-mx,dy=p.y-my;if(dx*dx+dy*dy<=p.r*p.r+16){hit=p;break}}
 if(hit&&hit.title){tip.style.display='block';tip.style.left=(e.clientX+10)+'px';tip.style.top=(e.clientY+10)+'px';tip.textContent=hit.title}
 else tip.style.display='none'};
</script></body></html>
"""
  }

  /** End-to-end analog of `Visualizer.visualize_graph` — prep distributed,
    * collect the bounded slice, write one HTML file. Returns the HTML. */
  def visualizeGraph(nodes: DataFrame, edges: DataFrame, level: Int = 0,
                     saveLocation: String = "graph_visual.html",
                     maxNodes: Int = 2000): String = {
    val (vn, ve) = visualData(nodes, edges, level, maxNodes)
    val html = renderHtml(vn.collect().toSeq, ve.collect().toSeq)
    java.nio.file.Files.write(java.nio.file.Paths.get(saveLocation),
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    html
  }
}
