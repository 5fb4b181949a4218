#!/usr/bin/env python3
"""Extract the reference's HiveSessionProperties inventory (the hive
catalog's session properties, served catalog-qualified by SHOW
SESSION), the sibling of extract_session_props.py: parses
presto-hive/.../HiveSessionProperties.java registrations plus the
config classes their defaults come from, and prints Scala `PropDef`
rows with catalog = Some("hive").
"""
import re
import sys
from pathlib import Path

HIVE = Path("/root/reference/presto-hive/src/main/java/com/facebook/presto/hive")
SSP = (HIVE / "HiveSessionProperties.java").read_text()

CONFIG_FILES = {
    "hiveClientConfig": HIVE / "HiveClientConfig.java",
    "orcFileWriterConfig": HIVE / "OrcFileWriterConfig.java",
    "parquetFileWriterConfig": HIVE / "ParquetFileWriterConfig.java",
}

CONSTS = dict(re.findall(
    r'(?:public|private) static final String (\w+) = "([^"]+)";', SSP))

DUR_UNITS = {"NANOSECONDS": "ns", "MICROSECONDS": "us",
             "MILLISECONDS": "ms", "SECONDS": "s", "MINUTES": "m",
             "HOURS": "h", "DAYS": "d"}
SIZE_UNITS = {"BYTE": "B", "KILOBYTE": "kB", "MEGABYTE": "MB",
              "GIGABYTE": "GB", "TERABYTE": "TB", "PETABYTE": "PB"}


def render_duration(num, unit):
    return "%.2f%s" % (float(num.replace("_", "")),
                       DUR_UNITS[unit.split(".")[-1]])


def render_datasize(num, unit):
    v = float(num.replace("_", ""))
    u = SIZE_UNITS[unit.split(".")[-1]]
    return ("%d%s" % (int(v), u)) if v == int(v) else "%.2f%s" % (v, u)


def parse_config_fields(text):
    out = {}
    text = re.sub(r"//[^\n]*", "", text)
    for m in re.finditer(
            r"private\s+([\w.<>]+)\s+(\w+)(?:\s*=\s*([^;]+))?;", text):
        typ, name, init = m.group(1), m.group(2), m.group(3)
        if init is None:
            out[name] = {"boolean": "false", "int": "0", "long": "0",
                         "double": "0.0"}.get(typ, "")
            continue
        init = init.strip()
        dm = re.match(
            r"new Duration\(([\d_.]+),\s*(?:TimeUnit\.)?(\w+)\)", init)
        sm = re.match(
            r"new DataSize\(([\d_.]+),\s*(?:DataSize\.)?(?:Unit\.)?(\w+)\)",
            init)
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
        elif re.match(r"^\w+\.\w+$", init):
            out[name] = init.split(".")[-1]
        elif re.match(r"^[A-Z][A-Z0-9_]*$", init):
            out[name] = init
        else:
            out[name] = "??" + init
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
    return "??%s.%s" % (cfg, getter)


def split_top(s):
    parts, depth, cur, instr = [], 0, [], False
    for i, c in enumerate(s):
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
    if cur:
        parts.append("".join(cur).strip())
    return parts


def parse_desc(expr):
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
    sm = re.match(
        r"new DataSize\(([\d_.]+),\s*(?:DataSize\.)?(?:Unit\.)?(\w+)\)",
        expr)
    if sm:
        return render_datasize(sm.group(1), sm.group(2))
    em = re.match(r"^(\w+)\.(\w+)$", expr)
    if em and em.group(2).isupper():
        return em.group(2)
    return "??default:" + expr


SQLTYPES = {"VARCHAR": "varchar", "BIGINT": "bigint", "INTEGER": "integer",
            "DOUBLE": "double", "BOOLEAN": "boolean"}

ctor = SSP[SSP.index("sessionProperties = ImmutableList.of("):]
depth, end, start = 0, None, ctor.index("(")
for i, c in enumerate(ctor[start:], start):
    if c == "(":
        depth += 1
    elif c == ")":
        depth -= 1
        if depth == 0:
            end = i
            break
body = ctor[start + 1:end]

props = []
for block in split_top(body):
    block = block.strip()
    hm = re.match(r"(stringProperty|booleanProperty|integerProperty|"
                  r"doubleProperty|longProperty|dataSizeSessionProperty|"
                  r"durationSessionProperty)\s*\((.*)\)\s*$", block, re.S)
    pm = re.match(r"new PropertyMetadata<>\s*\((.*)\)\s*$", block, re.S)
    if hm:
        kind, args = hm.group(1), split_top(hm.group(2))
        name = CONSTS[args[0]]
        desc = parse_desc(args[1])
        dflt = parse_default(args[2])
        hidden = args[3].strip() == "true"
        typ = {"stringProperty": "varchar", "booleanProperty": "boolean",
               "integerProperty": "integer", "doubleProperty": "double",
               "longProperty": "bigint",
               "dataSizeSessionProperty": "varchar",
               "durationSessionProperty": "varchar"}[kind]
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
        print("UNPARSED BLOCK: " + block[:100], file=sys.stderr)

# Hand-resolved defaults the field parser can't see, each verified
# against the reference:
#   getDefaultInsertExistingPartitionsBehavior -> APPEND (immutable
#     partitions default false); OrcWriterOptions.java:28-35 stripe/
#     dictionary/statistics defaults; OrcWriteValidationMode.BOTH with
#     validation percentage defaulting 0.0 -> validate false;
#   HiveStorageFormat ORC; parquet-hadoop ParquetWriter constants
#     (134217728 / 1048576 bytes); isTemporaryStagingDirectoryEnabled
#     = true; fileStatusCacheTables empty -> list-directory cache off.
OVERRIDES = {
    "insert_existing_partitions_behavior": "APPEND",
    "orc_string_statistics_limit": "64B",
    "orc_optimized_writer_validate": "false",
    "orc_optimized_writer_validate_mode": "BOTH",
    "orc_optimized_writer_min_stripe_size": "32MB",
    "orc_optimized_writer_max_stripe_size": "64MB",
    "orc_optimized_writer_max_stripe_rows": "10000000",
    "orc_optimized_writer_max_dictionary_memory": "16MB",
    "hive_storage_format": "ORC",
    "parquet_writer_block_size": "134217728B",
    "parquet_writer_page_size": "1048576B",
    "temporary_staging_directory_enabled": "true",
    "use_list_directory_cache": "false",
}
props = [(n, OVERRIDES.get(n, d), t, desc, h)
         for n, d, t, desc, h in props]

print("// %d hive properties (%d hidden)" %
      (len(props), sum(1 for p in props if p[4])))
for name, dflt, typ, desc, hidden in props:
    for field in (name, dflt, typ, desc):
        if "??" in field:
            print("REVIEW: %s -> %s" % (name, field), file=sys.stderr)
    flag = ", hidden = true" if hidden else ""
    desc_s = desc.replace("\\", "\\\\").replace('"', '\\"')
    print('    PropDef("%s", "%s", "%s",\n      "%s"%s,\n'
          '      catalog = Some("hive")),' % (name, dflt, typ, desc_s, flag))
