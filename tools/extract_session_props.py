#!/usr/bin/env python3
"""Extract the reference's SystemSessionProperties inventory.

Parses /root/reference/presto-main/.../SystemSessionProperties.java
registrations plus the five config classes those registrations pull
defaults from, resolves each property's (name, default-as-rendered-by-
SHOW-SESSION, sql type, description, hidden), and prints the Scala
`PropDef` rows for graft's registry.  Dev-only tool — the emitted rows
are spec-surface replication (names/defaults/types/descriptions), the
serving code is graft's own.

SHOW SESSION renders defaults via `firstNonNull(getDefaultValue(), "")
.toString()` (SessionPropertyManager.java:132), so: airlift Duration →
"%.2f%s", DataSize → integral "NGB" else "%.2f%s", enum → name,
boolean/int/double → Java toString, null → "".
"""
import re
import sys
from pathlib import Path

REF = Path("/root/reference/presto-main/src/main/java/com/facebook/presto")
SSP = (REF / "SystemSessionProperties.java").read_text()

CONFIG_FILES = {
    "queryManagerConfig": REF / "execution/QueryManagerConfig.java",
    "taskManagerConfig": REF / "execution/TaskManagerConfig.java",
    "memoryManagerConfig": REF / "memory/MemoryManagerConfig.java",
    "featuresConfig": REF / "sql/analyzer/FeaturesConfig.java",
    "nodeMemoryConfig": REF / "memory/NodeMemoryConfig.java",
}

# ---- constants: NAME -> "string" ------------------------------------
CONSTS = dict(re.findall(
    r'public static final String (\w+) = "([^"]+)";', SSP))

# ---- config field defaults ------------------------------------------
DUR_UNITS = {"NANOSECONDS": "ns", "MICROSECONDS": "us",
             "MILLISECONDS": "ms", "SECONDS": "s", "MINUTES": "m",
             "HOURS": "h", "DAYS": "d"}
SIZE_UNITS = {"BYTE": "B", "KILOBYTE": "kB", "MEGABYTE": "MB",
              "GIGABYTE": "GB", "TERABYTE": "TB", "PETABYTE": "PB"}


def render_duration(num, unit):
    return "%.2f%s" % (float(num), DUR_UNITS[unit.split(".")[-1]])


def render_datasize(num, unit):
    v = float(num)
    u = SIZE_UNITS[unit.split(".")[-1]]
    if v == int(v):
        return "%d%s" % (int(v), u)
    return "%.2f%s" % (v, u)


def parse_config_fields(text):
    """field name -> rendered default string (as toString would)."""
    out = {}
    # strip comments
    text = re.sub(r"//[^\n]*", "", text)
    for m in re.finditer(
            r"private\s+([\w.<>]+)\s+(\w+)(?:\s*=\s*([^;]+))?;", text):
        typ, name, init = m.group(1), m.group(2), m.group(3)
        if init is None:
            out[name] = {"boolean": "false", "int": "0", "long": "0",
                         "double": "0.0"}.get(typ, "")
            continue
        init = init.strip()
        dm = re.match(r"new Duration\(([\d_.]+),\s*(?:TimeUnit\.)?(\w+)\)",
                      init)
        sm = re.match(r"new DataSize\(([\d_.]+),\s*(?:DataSize\.)?(?:Unit\.)?(\w+)\)", init)
        if dm:
            out[name] = render_duration(dm.group(1), dm.group(2))
        elif sm:
            out[name] = render_datasize(sm.group(1), sm.group(2))
        elif init in ("true", "false"):
            out[name] = init
        elif init == "null":
            out[name] = ""
        elif re.match(r'^"', init):
            out[name] = init.strip('"')
        elif re.match(r"^-?[\d_]+$", init):
            out[name] = init.replace("_", "")
        elif re.match(r"^-?[\d.]+$", init):
            out[name] = init
        elif re.match(r"^\w+\.\w+$", init):  # EnumClass.VALUE
            out[name] = init.split(".")[-1]
        elif re.match(r"^[A-Z][A-Z0-9_]*$", init):  # static-import VALUE
            out[name] = init
        else:
            out[name] = "??" + init  # flag for manual review
    return out


CONFIG_DEFAULTS = {k: parse_config_fields(p.read_text())
                   for k, p in CONFIG_FILES.items()}


def resolve_getter(cfg, getter):
    fields = CONFIG_DEFAULTS[cfg]
    for pref in ("get", "is"):
        if getter.startswith(pref):
            f = getter[len(pref):]
            f = f[0].lower() + f[1:]
            if f in fields:
                return fields[f]
    # getter doing logic — look at its body
    text = CONFIG_FILES[cfg].read_text()
    bm = re.search(r"public [\w.<>]+ %s\(\)\s*\{(.*?)\n    \}" % getter,
                   text, re.S)
    if bm:
        body = bm.group(1)
        rm = re.search(r"return ([^;]+);", body)
        if rm:
            expr = rm.group(1).strip()
            if expr in fields:
                return fields[expr]
    return "??%s.%s" % (cfg, getter)


# ---- enum values for format() descriptions ---------------------------
def enum_values(enum_name):
    for p in [REF / "sql/analyzer/FeaturesConfig.java",
              REF / "execution/QueryManagerConfig.java",
              REF / "sql/analyzer/PartialMergePushdownStrategy.java"]:
        if not p.exists():
            continue
        t = re.sub(r"//[^\n]*", "", p.read_text())
        # constant list ends at the first ';' (methods follow) or '}'
        m = re.search(r"enum %s\s*\{(.*?)[;}]" % enum_name, t, re.S)
        if m:
            vals = []
            for tok in m.group(1).split(","):
                tok = tok.strip().split("(")[0].strip()
                if re.match(r"^[A-Z_][A-Z0-9_]*$", tok):
                    vals.append(tok)
            return vals
    return None


# ---- registration blocks ---------------------------------------------
ctor = SSP[SSP.index("sessionProperties = ImmutableList.of("):]
# cut at the closing of ImmutableList.of( ... );
depth = 0
end = None
start = ctor.index("(")
for i, c in enumerate(ctor[start:], start):
    if c == "(":
        depth += 1
    elif c == ")":
        depth -= 1
        if depth == 0:
            end = i
            break
body = ctor[start + 1:end]


def split_top(s):
    parts, depth, cur, instr = [], 0, [], False
    i = 0
    while i < len(s):
        c = s[i]
        if instr:
            cur.append(c)
            if c == '"' and s[i - 1] != "\\":
                instr = False
        elif c == '"':
            cur.append(c)
            instr = True
        elif c in "([":
            depth += 1
            cur.append(c)
        elif c in ")]":
            depth -= 1
            cur.append(c)
        elif c == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        parts.append("".join(cur).strip())
    return parts


def parse_desc(expr):
    expr = expr.strip()
    fm = re.match(r'format\("(.+?)",\s*Stream\.of\((\w+)\.values\(\)\)',
                  expr, re.S)
    if fm:
        vals = enum_values(fm.group(2))
        if vals is None:
            return "??enum:" + fm.group(2)
        return fm.group(1) % ",".join(vals)
    # plain (possibly concatenated) string literal
    lits = re.findall(r'"((?:[^"\\]|\\.)*)"', expr)
    if lits:
        return "".join(lits).replace('\\"', '"')
    return "??desc:" + expr


def parse_default(expr):
    expr = expr.strip()
    if expr == "null":
        return ""
    if expr in ("true", "false"):
        return expr
    if re.match(r"^-?[\d_]+$", expr):
        return expr.replace("_", "")
    if re.match(r"^-?[\d.]+$", expr):
        return expr
    m = re.match(r"(\w+)\.(\w+)\(\)$", expr)
    if m and m.group(1) in CONFIG_DEFAULTS:
        return resolve_getter(m.group(1), m.group(2))
    dm = re.match(r"new Duration\(([\d_.]+),\s*(?:TimeUnit\.)?(\w+)\)", expr)
    if dm:
        return render_duration(dm.group(1), dm.group(2))
    sm = re.match(r"new DataSize\(([\d_.]+),\s*(?:DataSize\.)?(?:Unit\.)?(\w+)\)", expr)
    if sm:
        return render_datasize(sm.group(1), sm.group(2))
    em = re.match(r"^(\w+)\.(\w+)$", expr)
    if em and em.group(2).isupper():
        return em.group(2)
    return "??default:" + expr


SQLTYPES = {"VARCHAR": "varchar", "BIGINT": "bigint", "INTEGER": "integer",
            "DOUBLE": "double", "BOOLEAN": "boolean",
            "createUnboundedVarcharType()": "varchar"}

props = []
for block in split_top(body):
    block = block.strip()
    hm = re.match(r"(stringProperty|booleanProperty|integerProperty|"
                  r"doubleProperty|longProperty)\s*\((.*)\)\s*$",
                  block, re.S)
    pm = re.match(r"new PropertyMetadata<>\s*\((.*)\)\s*$", block, re.S)
    if hm:
        kind, args = hm.group(1), split_top(hm.group(2))
        name = CONSTS[args[0]]
        desc = parse_desc(args[1])
        dflt = parse_default(args[2])
        hidden = args[3].strip() == "true"
        typ = {"stringProperty": "varchar", "booleanProperty": "boolean",
               "integerProperty": "integer", "doubleProperty": "double",
               "longProperty": "bigint"}[kind]
        props.append((name, dflt, typ, desc, hidden))
    elif pm:
        args = split_top(pm.group(1))
        name = CONSTS[args[0]]
        desc = parse_desc(args[1])
        typ = SQLTYPES.get(args[2].strip(), "??type:" + args[2])
        dflt = parse_default(args[4])
        hidden = args[5].strip() == "true"
        props.append((name, dflt, typ, desc, hidden))
    else:
        print("UNPARSED BLOCK: " + block[:120], file=sys.stderr)

# Hand-resolved defaults the field parser can't see (getter fallback
# logic / cross-class constants), each verified against the reference:
#   GlobalSystemConnector.NAME = "system"; Integer.MAX_VALUE;
#   MemoryManagerConfig.getSoftMaxQueryMemory -> maxQueryMemory 20GB;
#   getSoftMaxQueryTotalMemory -> 2x soft max = 40GB.
# Machine-dependent defaults (heap fractions, core counts) are marked
# RUNTIME and computed in the Scala registry.
OVERRIDES = {
    "partitioning_provider_catalog": "system",
    "max_tasks_per_stage": "2147483647",
    "query_max_memory": "20GB",
    "query_max_total_memory": "40GB",
    "initial_splits_per_node": "RUNTIME",
    "query_max_memory_per_node": "RUNTIME",
    "query_max_total_memory_per_node": "RUNTIME",
}
props = [(n, OVERRIDES.get(n, d), t, desc, h)
         for n, d, t, desc, h in props]

print("// %d properties (%d hidden)" %
      (len(props), sum(1 for p in props if p[4])))
for name, dflt, typ, desc, hidden in props:
    flag = ", hidden = true" if hidden else ""
    for field in (name, dflt, typ, desc):
        if "??" in field:
            print("REVIEW: %s -> %s" % (name, field), file=sys.stderr)
    desc_s = desc.replace("\\", "\\\\").replace('"', '\\"')
    print('    PropDef("%s", "%s", "%s",\n      "%s"%s),'
          % (name, dflt, typ, desc_s, flag))
