"""Archive a sweep's best-member snapshots into data/checkpoints/.

usage: python scripts/archive_sweep.py <sweep_dir> <data/checkpoints/name>

``runs/`` is gitignored and does NOT survive the sandbox: round 5 lost the
round-4/5 per-seed best snapshots (and with them the designed laggard-rescue
warm starts) because only evaluation summaries had been copied out.  This
script makes archiving a one-liner so every sweep's per-member bests are
committed the moment the sweep ends:

- copies each ``best_member_XX`` orbax snapshot + its ``.json`` sidecar,
- copies ``members.json`` (the member specs) and any ``eval_summary*.json``,
- rewrites nothing — snapshots stay loadable by ``algo.evaluate`` /
  ``scripts/finalize_run.py`` / ``MemberSpec.init_from``.
"""

import glob
import json
import os
import shutil
import sys


def archive(sweep_dir: str, out_dir: str) -> list:
    os.makedirs(out_dir, exist_ok=True)
    copied = []
    for path in sorted(glob.glob(os.path.join(sweep_dir, "best_member_*"))):
        if path.endswith(".tmp"):
            continue  # half-written snapshot left by a SIGKILL mid-save
        name = os.path.basename(path)
        dst = os.path.join(out_dir, name)
        if os.path.isdir(path):
            if os.path.isdir(dst):
                shutil.rmtree(dst)
            shutil.copytree(path, dst)
        else:
            shutil.copy2(path, dst)
        copied.append(dst)
    for extra in ("members.json", "gate_report.json"):
        src = os.path.join(sweep_dir, extra)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(out_dir, extra))
            copied.append(os.path.join(out_dir, extra))
    # Member metric logs: the round-5 gate calibration was built from the
    # round-4 replication logs — they are measurement data, not scratch.
    logs_src = os.path.join(sweep_dir, "logs")
    if os.path.isdir(logs_src):
        logs_dst = os.path.join(out_dir, "logs")
        if os.path.isdir(logs_dst):
            shutil.rmtree(logs_dst)
        shutil.copytree(logs_src, logs_dst)
        copied.append(logs_dst)
    for src in glob.glob(os.path.join(sweep_dir, "eval_summary*.json")):
        shutil.copy2(src, os.path.join(out_dir, os.path.basename(src)))
        copied.append(os.path.join(out_dir, os.path.basename(src)))
    manifest = {
        "source": sweep_dir,
        "entries": [os.path.basename(p) for p in copied],
    }
    with open(os.path.join(out_dir, "archive_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return copied


def main(argv):
    sweep_dir, out_dir = argv[:2]
    copied = archive(sweep_dir, out_dir)
    for p in copied:
        print(p)
    print(f"archived {len(copied)} entries -> {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
