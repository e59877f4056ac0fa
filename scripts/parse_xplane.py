"""Minimal XSpace (jax profiler xplane.pb) parser — no proto deps.

Prints per-op device time aggregated over a trace, for TPU device planes.
Usage: python scripts/parse_xplane.py /tmp/trace1 [n_iters]
Wire format of tsl.profiler XSpace (xplane.proto):
  XSpace.planes=1; XPlane{id=1,name=2,lines=3,event_metadata=4(map)};
  XLine{id=1,name=2,timestamp_ns=3,events=4}; XEvent{metadata_id=1,
  offset_ps=2,duration_ps=3}; XEventMetadata{id=1,name=2}.
"""
import glob
import sys
from collections import defaultdict


def varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = varint(buf, i)
        elif wt == 2:
            ln, i = varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fno, wt, v


def parse_plane(buf):
    name = ""
    lines = []
    emeta = {}
    for fno, wt, v in fields(buf):
        if fno == 2 and wt == 2:
            name = v.decode("utf-8", "replace")
        elif fno == 3 and wt == 2:
            lines.append(v)
        elif fno == 4 and wt == 2:
            # map entry: key=1 varint, value=2 XEventMetadata
            k = None
            mname = ""
            for f2, w2, v2 in fields(v):
                if f2 == 1 and w2 == 0:
                    k = v2
                elif f2 == 2 and w2 == 2:
                    for f3, w3, v3 in fields(v2):
                        if f3 == 2 and w3 == 2:
                            mname = v3.decode("utf-8", "replace")
            if k is not None:
                emeta[k] = mname
    return name, lines, emeta


def parse_events(line_buf):
    for fno, wt, v in fields(line_buf):
        if fno == 4 and wt == 2:
            mid = dur = 0
            for f2, w2, v2 in fields(v):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 3 and w2 == 0:
                    dur = v2
            yield mid, dur


def main():
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace1"
    n_iter = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    top = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    files = glob.glob(f"{d}/**/*.xplane.pb", recursive=True)
    buf = open(sorted(files)[-1], "rb").read()
    for fno, wt, v in fields(buf):
        if fno != 1 or wt != 2:
            continue
        name, lines, emeta = parse_plane(v)
        if "TPU" not in name or "#Chip" not in name and "device" not in name.lower():
            if "/device:TPU" not in name and "TensorCore" not in name:
                continue
        tot = defaultdict(int)
        cnt = defaultdict(int)
        for lb in lines:
            for mid, dur in parse_events(lb):
                tot[emeta.get(mid, str(mid))] += dur
                cnt[emeta.get(mid, str(mid))] += 1
        if not tot:
            continue
        print(f"== PLANE: {name} (total {sum(tot.values())/1e9/n_iter:.3f} ms/iter)")
        for nm, ps in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{ps/1e9/n_iter:9.4f} ms/iter  x{cnt[nm]//n_iter:<5d} {nm[:100]}")


if __name__ == "__main__":
    main()
