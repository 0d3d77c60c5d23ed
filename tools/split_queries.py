#!/usr/bin/env python3
"""One-shot splitter: move QueryDef blocks from the two mega-files into
family files along CATALOG.md lines. Blocks are moved VERBATIM (comments
attached); helpers stay in Ext/ExtraQueries as private[ext]."""
import re, sys, collections

EXT = "src/main/scala/graft/ext/Ext.scala"
XQ = "src/main/scala/graft/ext/ExtraQueries.scala"

FAMILY = {}
def fam(name, qids):
    for q in qids.split():
        assert q not in FAMILY, q
        FAMILY[q] = name

fam("DedupQueries", """q24 q25 q26 q27 q44 q63 q69 q70 q72 q75 q96 q97 q104
  q106 q107 q109 q120 q127 q128 q129 q143 q164 q229 q231 q234 q237 q244
  q246 q247 q248""")
fam("SimilarityQueries", """q28 q29 q30 q41 q42 q43 q52 q58 q68 q108 q135
  q137 q138 q145 q146 q155 q192 q195 q196 q201 q202 q233""")
fam("TextQueries", """q31 q32 q33 q40 q46 q47 q48 q49 q55 q59 q65 q105 q112
  q113 q114 q117 q122 q125 q130 q134 q150 q151 q156 q158 q165 q166 q167
  q184 q230 q232 q240 q241 q242 q243 q249""")
fam("SamplingQueries", """q45 q50 q51 q56 q62 q64 q74 q115 q118 q126 q142
  q161 q163 q168 q178 q179 q180 q224 q252""")
fam("SketchQueries", """q60 q61 q71 q98 q133 q153 q154 q157 q170 q175 q182
  q199 q217 q225 q228 q245 q250""")
fam("GraphQueries", """q132 q139 q148 q162 q171 q172 q183 q187 q188 q197
  q220 q221 q222 q223 q235 q238 q253""")
fam("EventQueries", """q131 q141 q144 q149 q152 q159 q174 q181 q189 q190
  q191 q193 q194 q198 q203 q207 q208 q209 q214 q216 q219""")
fam("OpsQueries", """q140 q173 q185 q186 q200 q204 q205 q206 q210 q211
  q212 q218 q226 q227 q239 q251""")
fam("MultimodalQueries", """q34 q116 q119 q121 q124 q136 q215""")

DOCS = {
    "DedupQueries": "Deduplication family (CATALOG.md 'Dedup'): exact/LSH/"
        "SimHash near-dup, survivors, clusters, span/prefix joins, recall "
        "audits, incremental maintenance.",
    "SimilarityQueries": "Similarity-search / embedding family (CATALOG.md "
        "'Similarity search / embeddings'): brute/ANN top-k, IVF, "
        "SemDeDup, DBSCAN, spectral and cluster-quality audits.",
    "TextQueries": "Text analysis & curation family (CATALOG.md 'Text "
        "analysis & curation'): lang-ID, quality, tokenization, n-gram "
        "statistics, decontamination, drift.",
    "SamplingQueries": "Sampling / splits / packing / layout / privacy "
        "family (CATALOG.md 'Sampling, splits, packing, layout').",
    "SketchQueries": "Sketches & statistics family (CATALOG.md 'Sketches & "
        "statistics'): KMV/HLL/CMS/Misra-Gries, quantiles, robust stats, "
        "concentration.",
    "GraphQueries": "Graph family (CATALOG.md 'Graphs'): PageRank/HITS/"
        "BFS, triangles, k-core, communities (batch + incremental), link "
        "graph authority and selection.",
    "EventQueries": "Events / behavioral family (CATALOG.md 'Events / "
        "behavioral'): funnels, cohorts, anomalies, seasonality, "
        "stationary chains, growth accounting.",
    "OpsQueries": "Operational-monitoring slice of the events family: "
        "SCD/PIT state, incident correlation, SLO/burn alerting, "
        "lateness/debounce/attribution, release snapshot diffs.",
    "MultimodalQueries": "Multimodal & web family (CATALOG.md "
        "'Multimodal'): image/audio codec fixtures, URL canonicalization, "
        "HTML extraction, cross-modal audits.",
}

HEADER = """package graft.ext

import org.apache.spark.sql.functions._
import graft.queries.QueryDef
import graft.queries.QueryDef.tbl
import graft.ext.Ext._
import graft.ext.ExtraQueries._

/** {doc}
  *
  * Split verbatim out of the former Ext.scala / ExtraQueries.scala
  * mega-files along CATALOG.md family lines (round 7) — shared oracle
  * helpers remain in [[Ext]] / [[ExtraQueries]] as `private[ext]`. */
object {name} {{

  def queries: Seq[QueryDef] = Seq(
"""


def parse(path):
    lines = open(path).read().split("\n")
    start = next(i for i, l in enumerate(lines)
                 if re.match(r"^  def (all|queries): Seq\[QueryDef\] = Seq\($", l))
    # tail: find the closing "  )" line then "}" at end
    end = max(i for i, l in enumerate(lines) if l == "  )")
    header, body = lines[: start + 1], lines[start + 1 : end]
    blocks, cur, pend = [], None, []
    i = 0
    while i < len(body):
        l = body[i]
        if cur is None:
            if l in ("    QueryDef(", "    {"):
                cur = pend + [l]
                pend = []
                closer = "    )," if l == "    QueryDef(" else "    },"
            elif l.strip() == "" or l.lstrip().startswith("//"):
                pend.append(l)
            else:
                sys.exit(f"{path}: unexpected line outside block: {l!r}")
        else:
            cur.append(l)
            if l == closer:
                blocks.append(cur)
                cur = None
        i += 1
    assert cur is None and all(p.strip() == "" for p in pend), path
    out = []
    for b in blocks:
        text = "\n".join(b)
        m = re.search(r'"(q\d+)_', text)
        assert m, text[:200]
        out.append((m.group(1), text))
    return header, out


eh, eblocks = parse(EXT)
xh, xblocks = parse(XQ)
allb = eblocks + xblocks
print(f"blocks: ext={len(eblocks)} extra={len(xblocks)}")
missing = [q for q, _ in allb if q not in FAMILY]
extra = [q for q in FAMILY if q not in {q for q, _ in allb}]
assert not missing, f"unmapped: {missing}"
assert not extra, f"mapped but absent: {extra}"

groups = collections.defaultdict(list)
for q, text in allb:
    groups[FAMILY[q]].append((int(q[1:]), text))

for name, blocks in groups.items():
    blocks.sort()
    content = HEADER.format(doc=DOCS[name], name=name)
    content += "\n\n".join(t.rstrip() for _, t in blocks)
    content += "\n  )\n}\n"
    with open(f"src/main/scala/graft/ext/{name}.scala", "w") as f:
        f.write(content)
    print(f"{name}: {len(blocks)} blocks, {content.count(chr(10))} lines")

# rewrite the two mega-files: keep everything up to the Seq( line,
# drop the def line itself, close the object
def shrink(path, header):
    # header currently ends with the "def ... Seq(" line; drop it and any
    # immediately preceding blank line
    h = header[:-1]
    while h and h[-1].strip() == "":
        h.pop()
    h.append("}")
    open(path, "w").write("\n".join(h) + "\n")

shrink(EXT, eh)
shrink(XQ, xh)
print("shrunk mega-files")
