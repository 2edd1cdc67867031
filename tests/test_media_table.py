"""Arrow-IPC 'table' media kind: real decode through the actor pool,
numeric-mean feature exactness, and stub fallback for unknown payloads."""

import numpy as np
import pyarrow as pa
import pyarrow.ipc as ipc

from cerberus_ray.pipelines.multimodal import MediaDecoder, _synth_table


def test_synth_table_is_real_ipc():
    b = _synth_table(np.uint64(777))
    t = ipc.open_stream(b).read_all()
    assert t.column_names == ["id", "value", "tag"]
    assert 2 <= t.num_rows <= 17


def test_decode_arrow_feature_exactness():
    t = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                  "s": pa.array(["x", "y", "z"], pa.string()),
                  "b": pa.array([0.5, 1.5, 2.5], pa.float64())})
    sink = pa.BufferOutputStream()
    with ipc.new_stream(sink, t.schema) as w:
        w.write_table(t)
    payload = sink.getvalue().to_pybytes()
    d = MediaDecoder(feature_dim=4)
    w_, h_, nf, feat = d._decode_arrow(payload)
    assert (w_, h_, nf) == (3, 1, 3)
    # numeric columns in order: mean(a)=2, mean(b)=1.5; string skipped
    np.testing.assert_allclose(feat[:2], [2.0, 1.5])
    assert (feat[2:] == 0).all()


def test_unknown_payload_falls_to_stub(ray_session):
    import ray.data as rd

    from cerberus_ray.pipelines import multimodal as MM

    t = pa.table({
        "media_ref": pa.array(["v1"], pa.string()),
        "kind": pa.array(["video"], pa.string()),
        "payload": pa.array([b"\x00\x01\x02 not any known container"],
                            pa.binary())})
    out = MM.decode_media(rd.from_arrow(t), concurrency=1).to_pandas()
    assert out["decoder"].iloc[0] == "stub"
