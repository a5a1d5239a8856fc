#!/usr/bin/env python3
"""Regenerate SURVEY.md section 8's flat per-registry-row table from the
query/oracle sources. Prints markdown to stdout; splice with --splice."""
import re
import sys

FILES = ["src/main/scala/graft/queries/Queries.scala",
         "src/main/scala/graft/queries/LlmQueries.scala"]
ENTRY = re.compile(r'^\s*"([a-z0-9_]+)" -> \(\(s, d\)')
ORACLE = re.compile(r'^\s*"([a-z0-9_]+)" ->')
IMPL = re.compile(
    r'\b(?:graft\.)?(?:ops|streaming|engine|sources|functions)?\.?'
    r'(Dedup|Sessionize|Relational|Eval|TimeSeries|StreamOps|Similarity|'
    r'TextOps|Retrieval|CorpusOps|Graph|Multimodal|AsOf|Skew|Layout|UrlOps|'
    r'FuzzyJoin|SetSimJoin|QuantileSketch|Recommend|Skyline|Spatial|'
    r'Parallelism|Encode|KafkaShape|Monitoring|CommitLog|AvroOcf|'
    r'GraftFunctions|AnnIndexStore|TextIndexStore|OcfMaintenance|'
    r'SessionStream|DedupStream|AnnStream|AsOfStream|Scd2Stream|'
    r'IvmStream|LinkageStream|LmScoreStream|TextIndexStream|'
    r'CommitLogStream|DriftStream|SetSimStream|SketchStream|OhlcStream|'
    r'RateLimitStream|AnomalyStream|JoinStream|SlidingWordCountStream|'
    r'StreamingPipelines|KafkaShapedStream|PartitionHealthTws)\.(\w+)')


def table():
    defs, oracles = {}, {}
    for f in FILES:
        lines = open(f).read().split("\n")
        entries = [(m.group(1), i) for i, l in enumerate(lines)
                   if (m := ENTRY.match(l))]
        for name, i in entries:
            impl = None
            for k in range(i, min(i + 40, len(lines))):
                m = IMPL.search(lines[k])
                if m:
                    impl = f"{m.group(1)}.{m.group(2)}"
                    break
            defs.setdefault(name,
                            (f.split("/")[-1], i + 1, impl or "inline DF"))
        for i, l in enumerate(lines):
            m = ORACLE.match(l)
            if m and not ENTRY.match(l):
                oracles.setdefault(m.group(1), (f.split("/")[-1], i + 1))
    names = sorted(defs)
    out = ["| # | query | defined at | primary op | oracle SQL |",
           "|---|---|---|---|---|"]
    for n, name in enumerate(names, 1):
        f, ln, impl = defs[name]
        of, oln = oracles.get(name, ("?", 0))
        out.append(f"| {n} | `{name}` | `{f}:{ln}` | `{impl}` "
                   f"| `{of}:{oln}` |")
    return len(names), out


def main():
    n, rows = table()
    if "--splice" in sys.argv:
        lines = open("SURVEY.md").read().split("\n")
        start = next(i for i, l in enumerate(lines)
                     if l.startswith("| # | query |"))
        end = start
        while end < len(lines) and lines[end].startswith("|"):
            end += 1
        lines[start:end] = rows
        open("SURVEY.md", "w").write("\n".join(lines))
        print(f"spliced {n} rows into SURVEY.md")
    else:
        print("\n".join(rows))


if __name__ == "__main__":
    main()
