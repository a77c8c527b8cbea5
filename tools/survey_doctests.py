"""Survey the reference doctest blocks: parse iex> blocks and categorize
final-call verb + output kind, to calibrate the v2 extractor."""
import re, sys, collections

def blocks(path):
    lines = open(path).read().splitlines()
    i = 0
    out = []
    while i < len(lines):
        m = re.match(r"^(\s*)iex> ", lines[i])
        if not m:
            i += 1
            continue
        ind = m.group(1)
        start = i
        stmts = []
        while i < len(lines):
            l = lines[i]
            if l.startswith(ind + "iex> "):
                stmts.append(l[len(ind) + 5:])
                i += 1
            elif l.startswith(ind + "...> "):
                if stmts:
                    stmts[-1] += " " + l[len(ind) + 5:].strip()
                i += 1
            else:
                break
        # output: lines until blank or dedent
        outlines = []
        while i < len(lines):
            l = lines[i]
            if l.strip() == "":
                break
            if not l.startswith(ind):
                break
            if re.match(r"^\s*iex> ", l):
                break
            outlines.append(l[len(ind):])
            i += 1
        out.append((start + 1, stmts, outlines))
    return out

def final_call(stmt):
    s = stmt
    m = re.match(r"^\w+ = (.*)$", s)
    if m: s = m.group(1)
    # pipe: take last segment
    if "|>" in s:
        s = s.split("|>")[-1].strip()
    m = re.match(r"^Explorer\.(DataFrame|Series|Query|Duration)\.(\w+[!?]?)", s)
    if m:
        return m.group(1) + "." + m.group(2)
    m = re.match(r"^(\w+[!?]?)\(", s)
    if m:
        return "BARE." + m.group(1)
    return "OTHER"

def out_kind(outlines):
    if not outlines: return "none"
    h = outlines[0].strip()
    if h.startswith("#Explorer.DataFrame<"): return "frame"
    if h.startswith("#Explorer.Series<"): return "series"
    if h.startswith("** ("): return "raise"
    if h.startswith("#"): return "other_struct"
    return "scalar"

for path in sys.argv[1:]:
    bl = blocks(path)
    print(path, len(bl), "blocks")
    kinds = collections.Counter()
    verbs = collections.Counter()
    hard = collections.Counter()
    for ln, stmts, outl in bl:
        k = out_kind(outl)
        fc = final_call(stmts[-1]) if stmts else "?"
        kinds[(k)] += 1
        verbs[fc] += 1
        body = " ".join(stmts)
        tags = []
        if "fn " in body or "&" in body: tags.append("fn")
        if "Datasets" in body: tags.append("datasets")
        if '#{' in body: tags.append("interp")
        if "for " in body: tags.append("compr")
        for t in tags: hard[t] += 1
    print(" kinds:", dict(kinds))
    print(" hard:", dict(hard))
    print(" top verbs:", verbs.most_common(40))
