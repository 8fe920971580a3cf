"""Table integrity check — the lake's fsck.

Verifies a committed table's manifest ↔ filesystem invariants (the things
the exactly-once commit protocol promises) and reports findings instead of
assuming them:

- ``missing_file``   (error): a file referenced by a retained manifest is
  gone from disk — time-travel or HEAD reads would fail. Can't be repaired;
  restore from the WAL via replay.
- ``row_mismatch``   (error): a clean single-snapshot partition whose
  parquet footer row count disagrees with the manifest's exact row count.
- ``orphan_file``    (warn): a parts/ file no retained manifest references
  — a crashed epoch's leftovers. ``repair=True`` removes them (what the
  post-commit GC would do).
- ``tmp_leftover``   (warn): ``*.tmp*`` files from interrupted writes;
  removed on repair.
- ``watermark_skew`` (warn): per-partition LSN watermarks differ — legal
  mid-crash (merge re-filters per pid) but never after a clean commit.
- ``bad_history``    (error): manifest history epochs not strictly
  increasing or head epoch mismatched.
- ``bad_epoch``      (warn): a retained historical manifest that fails to
  load (time travel to it is gone; HEAD is unaffected).

Everything here is parquet-FOOTER / manifest metadata work — no data pages
are read, so fsck on a huge table costs O(files) metadata reads."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from .manifest import Manifest, load_manifest, retained_epochs


def fsck_table(table_dir: str, repair: bool = False) -> dict:
    """Read-only checks run lock-free (a concurrent epoch can make orphan/
    tmp WARNINGS transiently appear — its not-yet-committed files — which
    is harmless to report). ``repair=True`` MUST hold the single-writer
    lock: deleting an in-flight epoch's freshly promoted parts as "orphans"
    would corrupt the commit it races."""
    if repair:
        from .manifest import table_lock

        with table_lock(table_dir):
            return _fsck_locked(table_dir, repair=True)
    return _fsck_locked(table_dir, repair=False)


def _fsck_locked(table_dir: str, repair: bool) -> dict:
    man = load_manifest(table_dir)
    findings: list[dict] = []
    manifest_dirty = False  # a repair edited manifest state (not just disk)

    def add(check: str, severity: str, detail: str) -> None:
        findings.append(
            {"check": check, "severity": severity, "detail": detail}
        )

    # referenced files across HEAD + retained history
    live: set[str] = set()
    manifests: list[tuple[int, Manifest]] = [(man.epoch, man)]
    for ep in retained_epochs(table_dir):
        if ep == man.epoch:
            continue
        try:
            manifests.append((ep, load_manifest(table_dir, epoch=ep)))
        except Exception as e:  # unreadable history: time travel hole
            add("bad_epoch", "warn", f"epoch {ep} manifest unreadable: {e}")
    for ep, m in manifests:
        for pid, part in m.partitions.items():
            for f in part.get("files") or []:
                live.add(f)
                if not os.path.exists(os.path.join(table_dir, f)):
                    add(
                        "missing_file",
                        "error",
                        f"epoch {ep} pid {pid}: {f} referenced but absent",
                    )

    # filesystem walk: orphans + tmps
    checked = 0
    repaired = 0
    parts_root = os.path.join(table_dir, "parts")
    for root, _dirs, names in os.walk(parts_root):
        for name in names:
            checked += 1
            rel = os.path.relpath(os.path.join(root, name), table_dir)
            if ".tmp" in name:
                add("tmp_leftover", "warn", rel)
                if repair:
                    os.remove(os.path.join(table_dir, rel))
                    repaired += 1
            elif rel not in live:
                add("orphan_file", "warn", rel)
                if repair:
                    os.remove(os.path.join(table_dir, rel))
                    repaired += 1

    # exact row counts for clean single-snapshot chains (footer-only; delta
    # chains need a merge to verify and are out of fsck's metadata budget)
    for pid, part in man.partitions.items():
        files = part.get("files") or []
        if (
            part.get("exact_rows")
            and len(files) == 1
            and os.path.exists(os.path.join(table_dir, files[0]))
            and "delta-" not in os.path.basename(files[0])
        ):
            got = pq.ParquetFile(
                os.path.join(table_dir, files[0])
            ).metadata.num_rows
            if got != int(part["rows"]):
                add(
                    "row_mismatch",
                    "error",
                    f"pid {pid}: manifest says {part['rows']} rows, "
                    f"footer says {got} ({files[0]})",
                )

    # skip-index zones must describe live files only (a zone for a vanished
    # file is stale metadata — harmless to reads, but a commit-path bug)
    for pid, part in man.partitions.items():
        files = set(part.get("files") or [])
        stale = [f for f in (part.get("zones") or {}) if f not in files]
        if stale:
            add(
                "stale_zone",
                "warn",
                f"pid {pid}: zones for non-live file(s) {stale[:3]}",
            )
            if repair:
                part["zones"] = {
                    f: z for f, z in part["zones"].items() if f in files
                }
                repaired += 1
                manifest_dirty = True

    # watermark invariant: equal across partitions after a clean commit
    if man.partitions:
        wms = {int(p["watermark_lsn"]) for p in man.partitions.values()}
        if len(wms) > 1:
            add(
                "watermark_skew",
                "warn",
                f"per-partition watermarks differ: min {min(wms)} "
                f"max {max(wms)} (legal mid-crash; merge re-filters)",
            )

    # history sanity
    eps = [int(h["epoch"]) for h in man.history if "epoch" in h]
    if any(b <= a for a, b in zip(eps, eps[1:])):
        add("bad_history", "error", f"history epochs not increasing: {eps}")
    if eps and eps[-1] != man.epoch:
        add(
            "bad_history",
            "error",
            f"head epoch {man.epoch} != last history epoch {eps[-1]}",
        )

    if repair and manifest_dirty:
        # metadata repairs (stale zones) live in the manifest: persist them
        # through the normal atomic-swap commit (same epoch — fsck repairs
        # state, it does not advance the table)
        from .manifest import commit_manifest

        commit_manifest(man, allow_overwrite_version=True)

    errors = sum(1 for f in findings if f["severity"] == "error")
    return {
        "table": table_dir,
        "epoch": man.epoch,
        "ok": errors == 0,
        "errors": errors,
        "warnings": len(findings) - errors,
        "checked_files": checked,
        "repaired": repaired,
        "findings": findings,
    }
