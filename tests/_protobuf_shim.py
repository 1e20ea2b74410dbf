"""Sandbox-only protobuf enablement for the live
``transformWithStateInPandas`` test (r12 verdict Next #7).

The test container ships no ``google.protobuf`` and has no network,
so Spark 4.x's transformWithState driver<->worker state protocol
(whose generated ``StateMessage_pb2`` imports the protobuf runtime)
was permanently skip-gated. The container DOES carry a complete
pure-python protobuf 6.32 runtime inside the bundled google-cloud-sdk
(``platform/google_appengine/google/protobuf`` — Apache-2.0, public).
PySpark's gencode was produced by protoc 6.33, and protobuf's runtime
validator rejects a runtime one minor older than the gencode, so a
verbatim path insert fails the version gate.

:func:`ensure_protobuf` therefore copies that runtime into a tempdir
and neutralizes ONLY the gencode-version validator (6.32 vs 6.33
pure-python runtimes are wire-compatible for this protocol; the live
test then verifies end-to-end state semantics against the batch
aggregate, which would catch any real incompatibility). The shim is
strictly test-scoped: nothing in the engine imports protobuf, and a
container with a real protobuf install bypasses it entirely.

Must run BEFORE the Spark session is built: local-mode python workers
inherit ``PYTHONPATH`` from the JVM's process environment, captured
at JVM start.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

_SDK_PROTOBUF = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
)


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable in this process AND in
    Spark python workers. Returns True when protobuf is available
    (natively or via the shim)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    if not os.path.isdir(_SDK_PROTOBUF):
        return False
    shim_root = os.path.join(
        tempfile.gettempdir(), f"fcs_pb_shim_{os.getuid()}"
    )
    marker = os.path.join(shim_root, "_ready")
    if not os.path.exists(marker):
        # Build into a UNIQUE tempdir and commit with one atomic
        # os.rename (r13 ADVICE): the old copy-and-patch rmtree'd the
        # shared shim_root in place, so a second concurrent test
        # process could delete a root another process had already put
        # on sys.path. Under the rename protocol the shared root is
        # either absent or complete-with-marker — never partial.
        build = tempfile.mkdtemp(prefix="fcs_pb_shim_build_")
        try:
            bdst = os.path.join(build, "google", "protobuf")
            shutil.copytree(
                _SDK_PROTOBUF, bdst,
                ignore=shutil.ignore_patterns("blaze-out"),
            )
            rv = os.path.join(bdst, "runtime_version.py")
            src = open(rv).read()
            needle = "def ValidateProtobufRuntimeVersion("
            try:
                i = src.index(needle)
                j = src.index("\n", src.index("):", i))
            except ValueError:
                # upstream renamed/reshaped the validator — degrade
                # to the skip gate instead of raising out of conftest
                return False
            src = (
                src[: j + 1]
                + "  return  # test shim: 6.32 runtime vs 6.33 gencode "
                "(see tests/_protobuf_shim.py)\n"
                + src[j + 1:]
            )
            open(rv, "w").write(src)
            open(os.path.join(build, "_ready"), "w").close()
            try:
                os.rename(build, shim_root)
            except OSError:
                # a peer committed first (or a crashed pre-rename-era
                # partial occupies the root): trust a marked root,
                # otherwise clear the unmarked partial and retry once
                if not os.path.exists(marker):
                    shutil.rmtree(shim_root, ignore_errors=True)
                    try:
                        os.rename(build, shim_root)
                    except OSError:
                        if not os.path.exists(marker):
                            return False
        finally:
            shutil.rmtree(build, ignore_errors=True)
    if shim_root not in sys.path:
        sys.path.insert(0, shim_root)
    # workers fork from the JVM's environment — both vars must be in
    # os.environ BEFORE the session builds
    prev = os.environ.get("PYTHONPATH", "")
    if shim_root not in prev.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            shim_root + (os.pathsep + prev if prev else "")
        )
    os.environ.setdefault(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python"
    )
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False
