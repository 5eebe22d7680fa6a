"""Multimodal plumbing: decode-kernel injection seam.

The container has no PIL/ffmpeg, so the default kernels are deterministic
fakes; these tests prove the SEAM — a deployment-supplied kernel (here a
second fake) replaces the default without touching the Spark plumbing, and
the kernel function survives pickling into the task closure.
"""

from pyspark.sql import functions as F

from graflo_spark.ops import multimodal as mm


# NOTE: kernels are defined INSIDE the tests (closures) — cloudpickle ships
# nested functions by value, whereas a test-module-level function would be
# pickled by reference to a module the executors can't import. Production
# kernels live in an installed package, so by-reference pickling works there.


def test_extract_features_kernel_injection(spark):
    def _alt_feature_kernel(payload, dim):
        v = float(len(payload or b""))
        return [v + i for i in range(dim)]

    media = mm.synthetic_media(spark, n=9)
    default = {r["media_id"]: r["feature"]
               for r in mm.extract_features(media, dim=4).collect()}
    alt = {r["media_id"]: r["feature"]
           for r in mm.extract_features(
               media, dim=4, feature_kernel=_alt_feature_kernel).collect()}
    assert set(default) == set(alt) == set(range(9))
    # the alt kernel's output is structurally different and exactly what
    # the injected function computes
    payload_len = {r["media_id"]: r["n_bytes"]
                   for r in mm.extract_features(media, dim=4).collect()}
    for mid, feat in alt.items():
        base = float(payload_len[mid])
        assert feat == [base, base + 1, base + 2, base + 3]
    assert default != alt


def test_sample_frames_kernel_injection(spark):
    def _alt_frame_kernel(payload, ts_ms):
        return bytes(f"ALT:{len(payload or b'')}:{ts_ms}", "utf8")

    media = mm.synthetic_media(spark, n=9)
    out = mm.sample_frames(media, every_ms=1000,
                           frame_kernel=_alt_frame_kernel).collect()
    assert out, "synthetic media includes videos with nonzero duration"
    for r in out:
        assert bytes(r["frame_payload"]).startswith(b"ALT:")
        assert bytes(r["frame_payload"]).endswith(
            bytes(str(r["ts_ms"]), "utf8"))
    # default kernel unchanged (the oracle path)
    dflt = mm.sample_frames(media, every_ms=1000).collect()
    assert {bytes(r["frame_payload"]) for r in dflt} == {
        bytes(f"frame@{r['ts_ms']}", "utf8") for r in dflt}
