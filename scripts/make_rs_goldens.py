#!/usr/bin/env python3
"""Generate GF(2^16) Reed-Solomon golden vectors at PRODUCTION fec from the
reference schifra CLI.

The published experiments protect 564 data oligos with fec=169 (exps 1/4/7/
10-12) and 1128 with fec=338 (exps 0/3/6) over 65535-symbol shortened
codewords (BASELINE.md Table 1; RSCode_16bit_fileio.py:50-127). The round-3
goldens stop at fec=37; these exercise the codec at the scale the actual
file recovery runs at.

Protocol mirrored from the reference wrapper (RSCode_16bit_fileio.py):
the CLI is recompiled per fec with the parameters burned into a generated
header (:33-43); shortening = left-pad the byte stream with b'0' (symbol
0x3030) to the full 65535-symbol length and puncture the pad after
(:59-60, :95-99); erasure locations are uint16 records offset by the pad
length (:26-30, :97-99); symbols are little-endian uint16 of the raw byte
stream (schifra_RS_16bit_fileio.cpp:96-106).

Usage: python scripts/make_rs_goldens.py [--outdir tests/golden/rs]
"""
import argparse
import json
import pathlib
import struct
import subprocess
import tempfile

import numpy as np

REF = pathlib.Path("/root/reference/RSCode_schifra")
CODE_LEN = 65535


def build_binary(fec: int, workdir: pathlib.Path) -> pathlib.Path:
    (workdir / "RS_paramaters_from_python.hpp").write_text(
        f"const std::size_t code_length = {CODE_LEN};\n"
        f"const std::size_t fec_length  =  {fec};\n"
        "const std::size_t data_length = code_length - fec_length;\n"
        "const std::size_t field_descriptor                =   16;\n"
        "const std::size_t generator_polynomial_index      =    0;\n"
        f"const std::size_t generator_polynomial_root_count =  {fec};\n")
    out = workdir / f"rs_ref_f{fec}"
    subprocess.run(
        ["g++", "-std=c++11", "-O2", "-o", str(out),
         str(REF / "schifra_RS_16bit_fileio.cpp"),
         "-I", str(workdir), "-I", str(REF)],
        check=True, capture_output=True)
    return out


def run_cli(binary, mode: int, recv_bytes: bytes, erasures, workdir,
            pad_len: int):
    """mode 1 = encode, 0 = decode. recv_bytes is the FULL padded stream."""
    inp = workdir / "in.dat"
    outp = workdir / "out.dat"
    eras = workdir / "eras.dat"
    if outp.exists():
        outp.unlink()
    inp.write_bytes(recv_bytes)
    has_eras = 1 if erasures else 0
    if erasures:
        eras.write_bytes(b"".join(
            struct.pack("H", e + pad_len) for e in erasures))
    r = subprocess.run(
        [str(binary), str(mode), str(inp), str(outp), str(has_eras),
         str(eras)], capture_output=True)
    if not outp.exists():  # decode failure path (wrapper :113-116)
        return None, r
    return outp.read_bytes(), r


def to_syms(b: bytes):
    a = np.frombuffer(b, np.uint8).astype(np.int64)
    return (a[0::2] | (a[1::2] << 8)).tolist()


def to_bytes(syms) -> bytes:
    s = np.asarray(syms, np.int64)
    out = np.empty(2 * len(s), np.uint8)
    out[0::2] = s & 0xFF
    out[1::2] = (s >> 8) & 0xFF
    return out.tobytes()


def make_golden(num: int, fec: int, seed: int) -> dict:
    rng = np.random.default_rng(seed)
    workdir = pathlib.Path(tempfile.mkdtemp())
    binary = build_binary(fec, workdir)
    data_len = CODE_LEN - fec
    pad_len = data_len - num
    data = rng.integers(0, 1 << 16, num).tolist()

    enc_in = to_bytes(data).rjust(2 * data_len, b"0")
    enc_out, r = run_cli(binary, 1, enc_in, [], workdir, pad_len)
    assert enc_out is not None, r.stderr
    codeword = to_syms(enc_out[2 * pad_len:])
    assert codeword[:num] == data
    assert len(codeword) == num + fec

    def decode_case(name, recv, erasures, expect_ok=True):
        recv_b = to_bytes(recv).rjust(2 * CODE_LEN, b"0")
        out, r = run_cli(binary, 0, recv_b, list(erasures), workdir,
                         pad_len)
        ok = out is not None
        assert ok == expect_ok, (name, r.stdout, r.stderr)
        case = {"name": name, "recv": list(map(int, recv)),
                "erasures": list(map(int, erasures)), "ok": ok}
        if ok:
            case["decoded"] = to_syms(out[2 * pad_len:])[:num]
            assert case["decoded"] == data, f"{name}: reference corrected "\
                "to something else"
        return case

    cw = np.asarray(codeword)
    cases = [decode_case("clean", cw, [])]
    # max erasures (= fec), all zeroed
    er = sorted(rng.choice(num + fec, fec, replace=False).tolist())
    recv = cw.copy()
    recv[er] = 0
    cases.append(decode_case(f"erasures_{fec}", recv, er))
    # max errors (fec // 2)
    ne = fec // 2
    pos = rng.choice(num + fec, ne, replace=False)
    recv = cw.copy()
    recv[pos] ^= rng.integers(1, 1 << 16, ne)
    cases.append(decode_case(f"errors_{ne}", recv, []))
    # mixed: e erasures + t errors with e + 2t = fec
    e = fec // 3
    t = (fec - e) // 2
    e = fec - 2 * t
    pos = rng.choice(num + fec, e + t, replace=False)
    recv = cw.copy()
    recv[pos[:e]] = 0
    recv[pos[e:]] ^= rng.integers(1, 1 << 16, t)
    cases.append(decode_case(f"mixed_e{e}_t{t}", recv,
                             sorted(pos[:e].tolist())))
    # beyond capacity: fec//2 + a few extra errors -> decode failure
    ne = fec // 2 + 8
    pos = rng.choice(num + fec, ne, replace=False)
    recv = cw.copy()
    recv[pos] ^= rng.integers(1, 1 << 16, ne)
    cases.append(decode_case(f"fail_errors_{ne}", recv, [],
                             expect_ok=False))
    return {"num": num, "fec": fec, "data": data, "codeword": codeword,
            "decode_cases": cases}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="tests/golden/rs")
    args = ap.parse_args()
    outdir = pathlib.Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    # the two production scales (BASELINE.md Table 1)
    for num, fec, seed in ((564, 169, 11), (1128, 338, 12)):
        g = make_golden(num, fec, seed)
        fn = outdir / f"rs_golden_f{fec}.json"
        fn.write_text(json.dumps(g))
        print(f"wrote {fn}: num={num} fec={fec} "
              f"{len(g['decode_cases'])} cases")


if __name__ == "__main__":
    main()
