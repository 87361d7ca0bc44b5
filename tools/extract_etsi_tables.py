#!/usr/bin/env python3
"""One-off extractor: pulls ETSI EN 302 755 constant tables out of the reference
C++ headers into a generated Python data module.

The values are standard-mandated constants (pilot positions, PN sequences,
LDPC parity-bit addresses, ...), i.e. *data*, originally published in
ETSI EN 302 755 V1.4.1.  We extract them mechanically so they are exact.

Sources parsed (read-only):
  /root/reference/src/DVB_T2/dvbt2_definition.h      (PN seq, PAPR maps, CP groups, demux orders)
  /root/reference/src/DVB_T2/p1_symbol.h             (P1 active carriers, S1/S2 CSS patterns)
  /root/reference/src/DVB_T2/address_freq_deinterleaver.h (FI bit permutations)
  /root/reference/src/DVB_T2/LDPC/dvb_t2_tables.hh   (LDPC parity address tables)

Output: sdr_receiver_dvb_t2_tpu/dvbt2/_etsi_tables.py
"""
import re
import sys

REF = "/root/reference/src"
OUT = "/root/repo/sdr_receiver_dvb_t2_tpu/dvbt2/_etsi_tables.py"


def read(path):
    with open(path, "r", errors="replace") as f:
        return f.read()


def parse_int_arrays(text):
    """Parse `const <type> name[...] = { ... };` into {name: [ints]}."""
    out = {}
    pat = re.compile(
        r"const\s+(?:unsigned\s+char|uint8_t|int)\s+(\w+)\s*\[[^\]]*\]\s*=\s*\{(.*?)\};",
        re.S,
    )
    for m in pat.finditer(text):
        name, body = m.group(1), m.group(2)
        vals = [int(x, 0) for x in re.findall(r"0[xX][0-9a-fA-F]+|\d+", body)]
        out[name] = vals
    return out


def parse_2d_arrays(text):
    """Parse `const uint8_t name[A][B] = {{..},{..}};` into {name: [[ints]]}."""
    out = {}
    pat = re.compile(
        r"const\s+uint8_t\s+(\w+)\s*\[\d+\]\s*\[\d+\]\s*=\s*\{(.*?)\n\s*\};", re.S
    )
    for m in pat.finditer(text):
        name, body = m.group(1), m.group(2)
        rows = []
        for rm in re.finditer(r"\{([^{}]*)\}", body):
            rows.append([int(x, 0) for x in re.findall(r"0[xX][0-9a-fA-F]+|\d+", rm.group(1))])
        out[name] = rows
    return out


def parse_ldpc_tables(text):
    """Parse struct DVB_T2_TABLE_* {M,N,K,...,DEG[],LEN[],POS[]}."""
    out = {}
    pat = re.compile(r"struct\s+(DVB_T2_TABLE_\w+)\s*\{(.*?)\n\};", re.S)
    for m in pat.finditer(text):
        name, body = m.group(1), m.group(2)
        d = {}
        for km in re.finditer(r"static const int (\w+) = (\d+);", body):
            d[km.group(1)] = int(km.group(2))
        for am in re.finditer(r"int\s+(DEG|LEN|POS)\[\]\s*=\s*\{(.*?)\};", body, re.S):
            d[am.group(1)] = [int(x) for x in re.findall(r"\d+", am.group(2))]
        out[name] = d
    return out


def main():
    defs = parse_int_arrays(read(f"{REF}/DVB_T2/dvbt2_definition.h"))
    p1h = read(f"{REF}/DVB_T2/p1_symbol.h")
    p1_arrays = parse_int_arrays(p1h)
    p1_2d = parse_2d_arrays(p1h)
    fi = parse_int_arrays(read(f"{REF}/DVB_T2/address_freq_deinterleaver.h"))
    ldpc = parse_ldpc_tables(read(f"{REF}/DVB_T2/LDPC/dvb_t2_tables.hh"))

    lines = []
    w = lines.append
    w('"""ETSI EN 302 755 V1.4.1 constant tables (generated, do not edit).')
    w("")
    w("Standard-mandated data: PN sequence (clause 9.2.3.2), PAPR-reserved carrier")
    w("maps (Annex H tables H.2-H.7), continual-pilot groups (Annex H table H.1),")
    w("P1 signalling (clause 9.8), frequency-interleaver bit permutations (clause")
    w("6.5.2), bit-demux orders (clause 6.2.1) and LDPC parity-bit address tables")
    w("(Annex A/B).  Extracted mechanically by tools/extract_etsi_tables.py.")
    w('"""')
    w("")

    def emit(name, vals, per_line=14):
        w(f"{name} = [")
        for i in range(0, len(vals), per_line):
            w("    " + ", ".join(str(v) for v in vals[i : i + per_line]) + ",")
        w("]")
        w("")

    # PN sequence as packed bytes
    emit("PN_SEQUENCE_BYTES", defs["pn_sequence_table"], 16)

    for k in ["1k", "2k", "4k", "8k", "16k", "32k"]:
        emit(f"P2_PAPR_{k.upper()}", defs[f"p2_papr_map_{k}"])
        emit(f"TR_PAPR_{k.upper()}", defs[f"tr_papr_map_{k}"])

    # continual pilot groups, per pilot pattern: dict pp -> {group: list}
    w("CP_GROUPS = {")
    for pp in range(1, 9):
        groups = {}
        for g in range(1, 7):
            key = f"pp{pp}_cp{g}"
            if key in defs:
                groups[g] = defs[key]
        w(f"    {pp}: {{")
        for g, vals in groups.items():
            w(f"        {g}: [")
            for i in range(0, len(vals), 14):
                w("            " + ", ".join(str(v) for v in vals[i : i + 14]) + ",")
            w("        ],")
        w("    },")
    w("}")
    w("")

    # extra CP carriers for 8k/16k/32k per pilot pattern
    w("CP_EXTRA = {")
    for size in ["8k", "16k", "32k"]:
        w(f"    '{size}': {{")
        for pp in range(1, 9):
            key = f"pp{pp}_{size}"
            if key in defs:
                w(f"        {pp}: {defs[key]},")
        w("    },")
    w("}")
    w("")

    emit("BIT_DEMUX_16", defs["mux16"])
    emit("BIT_DEMUX_64", defs["mux64"])

    emit("P1_ACTIVE_CARRIERS", p1_arrays["p1_active_carriers"], 16)

    w("S1_PATTERNS = [")
    for row in p1_2d["s1_patterns"]:
        w("    [" + ", ".join(f"0x{v:02X}" for v in row) + "],")
    w("]")
    w("")
    w("S2_PATTERNS = [")
    for row in p1_2d["s2_patterns"]:
        for i in range(0, len(row), 16):
            pre = "    [" if i == 0 else "     "
            post = "]," if i + 16 >= len(row) else ""
            w(pre + ", ".join(f"0x{v:02X}" for v in row[i : i + 16]) + ("," if not post else "") + post)
    w("]")
    w("")

    for name in [
        "bitperm1keven", "bitperm1kodd", "bitperm2keven", "bitperm2kodd",
        "bitperm4keven", "bitperm4kodd", "bitperm8keven", "bitperm8kodd",
        "bitperm16keven", "bitperm16kodd", "bitperm32k",
    ]:
        emit("FI_" + name.upper().replace("BITPERM", "BITPERM_"), fi[name])

    # LDPC tables
    w("LDPC_TABLES = {")
    for name, d in sorted(ldpc.items()):
        key = name.replace("DVB_T2_TABLE_", "")
        w(f"    '{key}': {{")
        for f in ["M", "N", "K", "LINKS_MIN_CN", "LINKS_MAX_CN", "LINKS_TOTAL", "DEG_MAX"]:
            if f in d:
                w(f"        '{f}': {d[f]},")
        for f in ["DEG", "LEN"]:
            w(f"        '{f}': {d[f]},")
        w("        'POS': [")
        pos = d["POS"]
        for i in range(0, len(pos), 16):
            w("            " + ", ".join(str(v) for v in pos[i : i + 16]) + ",")
        w("        ],")
        w("    },")
    w("}")
    w("")

    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}: {len(lines)} lines")
    # sanity
    import importlib.util
    spec = importlib.util.spec_from_file_location("_etsi_tables", OUT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert len(mod.PN_SEQUENCE_BYTES) == 2624 // 8
    assert len(mod.P1_ACTIVE_CARRIERS) == 384
    assert len(mod.S1_PATTERNS) == 8 and len(mod.S2_PATTERNS) == 16
    assert len(mod.LDPC_TABLES) == 15
    assert mod.LDPC_TABLES["NORMAL_C1_2"]["N"] == 64800
    for k, t in mod.LDPC_TABLES.items():
        ngroups = sum(t["LEN"])
        assert ngroups * t["M"] == t["K"] or k in ("B8", "B9"), (k, ngroups, t["K"])
        assert len(t["POS"]) == sum(d * l for d, l in zip(t["DEG"], t["LEN"])), k
    print("sanity checks passed")


if __name__ == "__main__":
    sys.exit(main())
