#!/usr/bin/env python3
"""Reference-side executor for the differential fuzz harness
(tools/DiffFuzz.scala).

Reads a workload spec (text protocol, one op per line) on stdin, executes
each workload against the REAL reference implementation
(/root/reference/whisper.py) on throwaway .wsp files, and prints one
result line per op. The Scala side runs the same workloads against
graft's MetricStore and compares result lines value-exactly.

Spec protocol (one token-separated op per line):
  W <wid>                              start workload <wid>
  N <now>                              pinned `now` for every later op
  C <f> <agg> <xff> <spp:pts,...>      create file <f>
  U <f> <ts> <value>                   single update
  M <f> <ts:value,ts:value,...>        update_many (listed order matters)
  F <f> <from> <until>                 fetch
  G <f> <from> <until> <spp>           fetch with archiveToSelect
  I <f>                                info (header fields)
  R <src> <dst> <from|-> <to|->        merge src -> dst
  D <a> <b> <ignoreEmpty:0|1> <until|->  diff
  Z <f> <agg|-> <xff|-> <spp:pts,...>  resize (aggregate mode, pinned now)
  L <src> <dst> <startFrom>            whisper-fill fill_archives (pinned now)
  A <f> <method>                       setAggregationMethod -> old method
  X <f> <xff>                          setXFilesFactor -> old xff

Result protocol:
  W <wid>
  O <opIdx> ok
  O <opIdx> none                       fetch returned None
  O <opIdx> fetch <from> <until> <step> <v,v,n,...>   repr() floats, n=None
  O <opIdx> info <aggName> <maxRet> <xffRepr> <spp:pts,...>
  O <opIdx> diff <lvl>:<total>:<ts=va/vb;...> ...
  O <opIdx> err <ExcClass> <msg...>
"""
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/reference")
import whisper  # noqa: E402

_WHISPER_FILL = None


def load_whisper_fill():
    """Import the REAL bin/whisper-fill.py as a module (main() is guarded),
    so the L op executes the reference's fill_archives/fill code verbatim
    rather than a transcription."""
    global _WHISPER_FILL
    if _WHISPER_FILL is None:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "whisper_fill", "/root/reference/bin/whisper-fill.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _WHISPER_FILL = mod
    return _WHISPER_FILL


def fmt_v(v):
    return "n" if v is None else repr(float(v))


def parse_archives(tok):
    return [tuple(int(x) for x in part.split(":")) for part in tok.split(",")]


def run_op(tmpdir, parts, now_holder):
    op = parts[0]

    def path(f):
        return os.path.join(tmpdir, "f%s.wsp" % f)

    if op == "N":
        now_holder[0] = int(parts[1])
        return "ok"
    now = now_holder[0]
    if op == "C":
        whisper.create(path(parts[1]), parse_archives(parts[4]),
                       xFilesFactor=float(parts[3]),
                       aggregationMethod=parts[2])
        return "ok"
    if op == "U":
        whisper.update(path(parts[1]), float(parts[3]),
                       timestamp=int(parts[2]), now=now)
        return "ok"
    if op == "M":
        pts = [(int(t), float(v))
               for t, v in (p.split(":") for p in parts[2].split(","))]
        whisper.update_many(path(parts[1]), pts, now=now)
        return "ok"
    if op in ("F", "G"):
        sel = int(parts[4]) if op == "G" else None
        r = whisper.fetch(path(parts[1]), int(parts[2]),
                          untilTime=int(parts[3]), now=now,
                          archiveToSelect=sel)
        if r is None:
            return "none"
        (fromT, untilT, step), values = r
        return "fetch %d %d %d %s" % (
            fromT, untilT, step, ",".join(fmt_v(v) for v in values))
    if op == "I":
        info = whisper.info(path(parts[1]))
        arcs = ",".join("%d:%d" % (a["secondsPerPoint"], a["points"])
                        for a in info["archives"])
        return "info %s %d %s %s" % (
            info["aggregationMethod"], info["maxRetention"],
            repr(info["xFilesFactor"]), arcs)
    if op == "R":
        tf = None if parts[3] == "-" else int(parts[3])
        tt = None if parts[4] == "-" else int(parts[4])
        whisper.merge(path(parts[1]), path(parts[2]),
                      time_from=tf, time_to=tt, now=now)
        return "ok"
    if op == "D":
        until = None if parts[4] == "-" else int(parts[4])
        r = whisper.diff(path(parts[1]), path(parts[2]),
                         ignore_empty=parts[3] == "1",
                         until_time=until, now=now)
        toks = []
        for lvl, diffs, total in r:
            pts = ";".join("%d=%s/%s" % (ts, fmt_v(a), fmt_v(b))
                           for ts, a, b in diffs)
            toks.append("%d:%d:%s" % (lvl, total, pts))
        return "diff " + " ".join(toks)
    if op == "L":
        # bin/whisper-fill.py reads time.time() throughout (fill_archives
        # fromTime, fill's srcTime/rtime, and the un-pinned fetch /
        # update_many calls inside fill) — pin the clock for the call so
        # both engines run the same `now`, then restore it.
        wf = load_whisper_fill()
        import time as _time
        real_time = _time.time
        _time.time = lambda: float(now)
        try:
            wf.fill_archives(path(parts[1]), path(parts[2]), int(parts[3]))
        finally:
            _time.time = real_time
        return "ok"
    if op == "A":
        old = whisper.setAggregationMethod(path(parts[1]), parts[2])
        return "oldagg %s" % old
    if op == "X":
        old = whisper.setXFilesFactor(path(parts[1]), float(parts[2]))
        return "oldxff %s" % repr(old)
    if op == "Z":
        # Reference resize, aggregate mode: replicate
        # bin/whisper-resize.py:110-199 faithfully with a PINNED now
        # (the bin script reads time.time(); everything else is API
        # calls, reproduced 1:1 including the newest-first merge of old
        # archive streams and the per-new-archive xff'd re-aggregation).
        import bisect
        p = path(parts[1])
        info = whisper.info(p)
        agg = info["aggregationMethod"] if parts[2] == "-" else parts[2]
        xff = info["xFilesFactor"] if parts[3] == "-" else float(parts[3])
        new_archives = parse_archives(parts[4])
        old_archives = sorted(info["archives"],
                              key=lambda a: a["secondsPerPoint"])
        for archive in old_archives:
            fromTime = now - archive["retention"] + archive["secondsPerPoint"]
            archive["data"] = whisper.fetch(p, fromTime, untilTime=now,
                                            now=now)
        newfile = p + ".tmp"
        if os.path.exists(newfile):
            os.unlink(newfile)
        whisper.create(newfile, new_archives, xFilesFactor=xff,
                       aggregationMethod=agg)
        # --aggregate branch (whisper-resize.py:144-199)
        all_datapoints = []
        for archive in old_archives:
            timeinfo, values = archive["data"]
            new_datapoints = list(zip(range(*timeinfo), values))
            new_datapoints.reverse()
            if all_datapoints:
                last_timestamp = all_datapoints[-1][0]
                slice_end = 0
                for i, (timestamp, value) in enumerate(new_datapoints):
                    if timestamp < last_timestamp:
                        slice_end = i
                        break
                all_datapoints += new_datapoints[slice_end:]
            else:
                all_datapoints += new_datapoints
        all_datapoints.reverse()
        oldtimestamps = [pt[0] for pt in all_datapoints]
        oldvalues = [pt[1] for pt in all_datapoints]
        for archive in whisper.info(newfile)["archives"]:
            step = archive["secondsPerPoint"]
            fromTime = now - archive["retention"] + now % step
            untilTime = now + now % step + step
            timepoints_to_update = range(fromTime, untilTime, step)
            newdatapoints = []
            for tint in zip(timepoints_to_update[:-1],
                            timepoints_to_update[1:]):
                lefti = bisect.bisect_left(oldtimestamps, tint[0])
                righti = bisect.bisect_left(oldtimestamps, tint[1], lo=lefti)
                newvalues = oldvalues[lefti:righti]
                if newvalues:
                    non_none = [x for x in newvalues if x is not None]
                    if non_none and 1.0 * len(non_none) / len(newvalues) >= xff:
                        newdatapoints.append(
                            [tint[0],
                             whisper.aggregate(agg, non_none, newvalues)])
            whisper.update_many(newfile, newdatapoints, now=now)
        os.rename(newfile, p)
        return "ok"
    raise ValueError("unknown op %s" % op)


def main():
    tmp_root = tempfile.mkdtemp(prefix="wfuzz-")
    tmpdir = None
    now_holder = [0]
    op_idx = 0
    out = []
    try:
        for line in sys.stdin:
            line = line.strip()
            if not line:
                continue
            parts = line.split(" ")
            if parts[0] == "W":
                if tmpdir:
                    shutil.rmtree(tmpdir, ignore_errors=True)
                tmpdir = os.path.join(tmp_root, "w%s" % parts[1])
                os.makedirs(tmpdir)
                op_idx = 0
                out.append("W %s" % parts[1])
                continue
            try:
                res = run_op(tmpdir, parts, now_holder)
                out.append("O %d %s" % (op_idx, res))
            except Exception as e:  # noqa: BLE001 - compared by class+msg
                out.append("O %d err %s %s" % (
                    op_idx, type(e).__name__, str(e)))
            op_idx += 1
        sys.stdout.write("\n".join(out) + "\n")
    finally:
        shutil.rmtree(tmp_root, ignore_errors=True)


if __name__ == "__main__":
    main()
