"""Streaming-engine seam: pluggable model families at the live front
doors (runtime/engine.py).

The host loop (ring, pacing, metrics, control, panel, checkpoints) is
model-agnostic; an engine supplies the jitted steps, the carry, and the
LiveParams mapping.  These tests pin the OrthoModes family — the
reference's abandoned per-pixel design (computeOrthogonalModes.metal,
SURVEY.md §2.9) completed in models/orthomodes.py — behind the same
streaming surface the flagship uses.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from vaudio.api import Auralizer
from vaudio.config import AuralizerConfig, LiveParams
from vaudio.io import solid_color_frames


def _clip(n=6, size=64, color=(1.0, 0.2, 0.1)):
    return solid_color_frames(list(color), size, size, n)


class TestOrthoModesEngine:
    def test_stream_matches_offline_sonify(self):
        frames = _clip()
        aur = Auralizer(model="orthomodes")
        aur.run_until_exhausted(frames)
        aur.raise_if_failed()
        pcm = aur.pull(6 * 2048)
        aur.stop()
        off = Auralizer(model="orthomodes").sonify(np.asarray(frames))
        np.testing.assert_allclose(pcm, off[: len(pcm)], atol=2e-4)
        assert np.abs(pcm).max() > 1e-3        # audible

    def test_chunked_stream_matches_offline(self):
        frames = _clip()
        aur = Auralizer(model="orthomodes", chunk_frames=3)
        aur.run_until_exhausted(frames)
        aur.raise_if_failed()
        assert aur.metrics["dispatches"] == 2  # two scan chunks of 3
        pcm = aur.pull(6 * 2048)
        aur.stop()
        off = Auralizer(model="orthomodes").sonify(np.asarray(frames))
        np.testing.assert_allclose(pcm, off[: len(pcm)], atol=2e-4)

    def test_stereo_config_coerced_to_mono(self):
        aur = Auralizer(config=AuralizerConfig(channels=2),
                        model="orthomodes")
        assert aur.config.channels == 1
        assert not aur.config.enable_filters

    def test_live_params_apply(self):
        """attack/release/spectrum_mixing are live for the per-pixel
        family too: wildly different AGC settings must change the PCM."""
        frames = np.asarray(_clip(n=4))
        a = Auralizer(model="orthomodes",
                      params=LiveParams(attack=1.0, release=1.0))
        fast = a.sonify(frames)
        b = Auralizer(model="orthomodes",
                      params=LiveParams(attack=0.01, release=0.01))
        slow = b.sonify(frames)
        assert not np.allclose(fast, slow, atol=1e-5)

    def test_resolution_change_reinits_carry(self):
        """The per-pixel carry is sized by the frame: a mid-stream
        resolution change must re-initialize it (old oscillator state
        has no meaning at the new pixel count), not crash the producer."""
        frames = list(_clip(n=3, size=64)) + list(_clip(n=3, size=32))
        aur = Auralizer(model="orthomodes")
        aur.run_until_exhausted(frames)
        aur.raise_if_failed()
        m = aur.metrics
        assert m["frames_processed"] == 6
        assert m["resolution_changes"] == 1
        pcm = aur.pull(6 * 2048)
        aur.stop()
        assert np.isfinite(pcm).all()

    def test_checkpoint_roundtrip_and_cross_model_guard(self, tmp_path):
        frames = _clip(n=4)
        aur = Auralizer(model="orthomodes")
        aur.run_until_exhausted(frames)
        p = str(tmp_path / "ortho.npz")
        aur.save_state(p)
        aur.load_state(p)                      # engine-aware restore
        aur.stop()
        flag = Auralizer()                     # flagship engine
        with pytest.raises(ValueError, match="checkpoint"):
            flag.load_state(p)                 # per-pixel carry rejected
        flag2 = Auralizer(model="orthomodes")
        fp = str(tmp_path / "flag.npz")
        flag.save_state(fp)
        with pytest.raises(ValueError, match="OrthoModes"):
            flag2.load_state(fp)               # flagship carry rejected

    def test_snapshot_before_first_frame_is_loud(self):
        aur = Auralizer(model="orthomodes")
        with pytest.raises(ValueError, match="first frame"):
            aur.save_state("/tmp/never.npz")

    def test_state_npz_before_first_frame_answers_409(self):
        """GET /state.npz on a deferred-carry stream used to raise an
        uncaught ValueError and drop the connection."""
        import urllib.error
        import urllib.request
        aur = Auralizer(model="orthomodes")
        server = aur.serve(port=0)
        try:
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(server.url + "state.npz",
                                       timeout=60)
            assert e.value.code == 409
            assert "carry" in json.loads(e.value.read())["error"]
        finally:
            server.stop()

    def test_cross_resolution_checkpoint_fails_clearly(self, tmp_path):
        """An orthomodes checkpoint from 64x64 restored into a 128x128
        stream used to die with an opaque broadcast error inside jit;
        the first dispatch now validates it (engine.carry_mismatch)."""
        aur = Auralizer(model="orthomodes")
        aur.run_until_exhausted(_clip(n=2, size=64))
        p = str(tmp_path / "r64.npz")
        aur.save_state(p)
        aur.stop()
        aur2 = Auralizer(model="orthomodes")
        aur2.load_state(p)                 # shapes unknowable here: ok
        with pytest.raises(RuntimeError) as e:
            aur2.run_until_exhausted(_clip(n=2, size=128))
            aur2.raise_if_failed()
        assert "oscillators" in str(e.value.__cause__)
        aur2.stop()
        # Same resolution restores still work.
        aur3 = Auralizer(model="orthomodes")
        aur3.load_state(p)
        aur3.run_until_exhausted(_clip(n=2, size=64))
        aur3.raise_if_failed()
        aur3.stop()

    def test_inspect_frame_and_debug_sonify_guards(self):
        aur = Auralizer(model="orthomodes")
        with pytest.raises(ValueError, match="16-cell"):
            aur.inspect_frame(np.zeros((64, 64, 3), np.float32))
        with pytest.raises(ValueError, match="debug"):
            aur.sonify(np.asarray(_clip(n=2)), debug=True)

    def test_frame_error_is_engine_aware(self):
        aur = Auralizer(model="orthomodes")
        yuv = {"y": np.zeros((64, 64), np.uint8),
               "u": np.zeros((32, 32), np.uint8),
               "v": np.zeros((32, 32), np.uint8)}
        assert "RGB-only" in aur.frame_error(yuv)
        assert aur.frame_error(np.zeros((64, 64, 3), np.float32)) is None
        flagship = Auralizer(config=AuralizerConfig(mip_level=1))
        assert flagship.frame_error(yuv) is None

    def test_push_serving_full_loop(self):
        """The per-pixel family behind the NETWORK front door: push
        frames over HTTP, spectrum view renders, hue view (absent for
        this family) answers 404, PCM lands."""
        import io
        import urllib.error
        import urllib.request

        from vaudio.io import PushSource
        ps = PushSource(when_empty="block")
        aur = Auralizer(source=ps, model="orthomodes", debug=True)
        server = aur.serve(port=0)
        try:
            aur.start()
            clip = np.asarray(_clip(n=4))
            for f in clip:
                buf = io.BytesIO()
                np.save(buf, f)
                req = urllib.request.Request(
                    server.url + "frames", data=buf.getvalue(),
                    method="POST")
                with urllib.request.urlopen(req, timeout=120) as r:
                    assert r.status == 200
            import time
            deadline = time.monotonic() + 120
            while (aur.metrics["frames_processed"] < 4
                   and time.monotonic() < deadline):
                time.sleep(0.05)
            assert aur.metrics["frames_processed"] == 4
            with urllib.request.urlopen(server.url + "debug/spectrum.png",
                                        timeout=60) as r:
                assert r.status == 200 and r.read()[:8] == b"\x89PNG\r\n\x1a\n"
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(server.url + "debug/hue_matrix.png",
                                       timeout=60)
            assert e.value.code == 404
        finally:
            server.stop()
            aur.stop()


class TestOrthoModesPod:
    def _run_pod(self, pod, sources, timeout=180):
        import time
        pod.start([iter(s) for s in sources])
        t0 = time.monotonic()
        while pod.is_running and time.monotonic() - t0 < timeout:
            time.sleep(0.05)
        pod.raise_if_failed()

    def test_pod_slots_match_offline(self):
        from vaudio.runtime import MultiStreamAuralizer
        from vaudio.runtime.engine import make_engine
        eng = make_engine("orthomodes", AuralizerConfig())
        pod = MultiStreamAuralizer(eng.cfg, n_streams=2, engine=eng)
        a = _clip(color=(1, 0.2, 0.1))
        b = _clip(color=(0.1, 0.3, 1))
        self._run_pod(pod, [a, b])
        for src, slot in ((a, 0), (b, 1)):
            off = Auralizer(model="orthomodes").sonify(np.asarray(src))
            got = pod.pull(slot, 6 * 2048)
            np.testing.assert_allclose(got, off[: len(got)], atol=2e-4)
        pod.stop()

    def test_chunked_pod_matches_offline(self):
        from vaudio.runtime import MultiStreamAuralizer
        from vaudio.runtime.engine import make_engine
        eng = make_engine("orthomodes", AuralizerConfig())
        pod = MultiStreamAuralizer(eng.cfg, n_streams=2, engine=eng,
                                   chunk_frames=3)
        a = _clip(color=(1, 0.2, 0.1))
        b = _clip(color=(0.1, 0.3, 1))
        self._run_pod(pod, [a, b])
        assert pod.metrics.dispatches == 2
        off = Auralizer(model="orthomodes").sonify(np.asarray(a))
        got = pod.pull(0, 6 * 2048)
        np.testing.assert_allclose(got, off[: len(got)], atol=2e-4)
        pod.stop()

    def test_pod_checkpoint_engine_aware(self, tmp_path):
        from vaudio.runtime import MultiStreamAuralizer
        from vaudio.runtime.engine import make_engine
        eng = make_engine("orthomodes", AuralizerConfig())
        pod = MultiStreamAuralizer(eng.cfg, n_streams=2, engine=eng)
        self._run_pod(pod, [_clip(n=4), _clip(n=4)])
        p = str(tmp_path / "pod.npz")
        pod.save_state(p)
        pod.load_state(p)
        pod.stop()
        flagship_pod = MultiStreamAuralizer(AuralizerConfig(),
                                            n_streams=2)
        with pytest.raises(ValueError, match="OrthoCarry"):
            flagship_pod.load_state(p)
        wrong_size = MultiStreamAuralizer(eng.cfg, n_streams=3,
                                          engine=make_engine(
                                              "orthomodes",
                                              AuralizerConfig()))
        with pytest.raises(ValueError, match="pod size"):
            wrong_size.load_state(p)

    def test_mesh_pod_rejects_cell_axis(self):
        """TP ('cell' axis > 1) is flagship synthesis structure; other
        families mesh-shard over 'stream' only."""
        import jax
        from jax.sharding import Mesh
        from vaudio.runtime import MultiStreamAuralizer
        from vaudio.runtime.engine import make_engine
        mesh = Mesh(np.array(jax.devices()[:2]).reshape(1, 2),
                    ("stream", "cell"))
        eng = make_engine("orthomodes", AuralizerConfig())
        with pytest.raises(ValueError, match="cell"):
            MultiStreamAuralizer(eng.cfg, n_streams=2, engine=eng,
                                 mesh=mesh, params=LiveParams())

    @pytest.mark.parametrize("chunk", [1, 3])
    def test_mesh_dp_pod_matches_offline(self, chunk):
        """The second model family on the multi-chip path: the engine's
        raw step DP-sharded over the mesh 'stream' axis
        (parallel.make_engine_parallel_step) produces the same PCM as
        the single-device offline run — incl. the chunked dispatch and
        the frame-sized carry sharded at first tick."""
        import jax
        from jax.sharding import Mesh
        from vaudio.runtime import MultiStreamAuralizer
        from vaudio.runtime.engine import make_engine
        mesh = Mesh(np.array(jax.devices()[:2]), ("stream",))
        eng = make_engine("orthomodes", AuralizerConfig())
        pod = MultiStreamAuralizer(eng.cfg, n_streams=2, engine=eng,
                                   mesh=mesh, params=LiveParams(),
                                   chunk_frames=chunk)
        a = _clip(color=(1, 0.2, 0.1))
        b = _clip(color=(0.1, 0.3, 1))
        self._run_pod(pod, [a, b])
        for src, slot in ((a, 0), (b, 1)):
            off = Auralizer(model="orthomodes").sonify(np.asarray(src))
            got = pod.pull(slot, 6 * 2048)
            assert len(got) > 0
            np.testing.assert_allclose(got, off[: len(got)], atol=2e-4)
        pod.stop()

    def test_pod_door_validation_is_engine_aware(self):
        from vaudio.runtime import MultiStreamAuralizer
        from vaudio.runtime.engine import make_engine
        eng = make_engine("orthomodes", AuralizerConfig())
        pod = MultiStreamAuralizer(eng.cfg, n_streams=1, engine=eng)
        yuv = {"y": np.zeros((64, 64), np.uint8),
               "u": np.zeros((32, 32), np.uint8),
               "v": np.zeros((32, 32), np.uint8)}
        assert "RGB-only" in pod.check_frame(yuv)
        assert pod.check_frame(np.zeros((64, 64, 3), np.uint8)) is None

    def test_replace_source_reset_matches_init(self):
        """The engine-agnostic slot reset (zeros + running_max=1) must
        equal a fresh flagship init_carry row exactly.  White-box and
        race-free: run the pod to completion, then apply the re-arm
        directly (no producer racing the snapshot)."""
        from vaudio.runtime import MultiStreamAuralizer
        from vaudio.runtime.step import init_carry
        pod = MultiStreamAuralizer(AuralizerConfig(), n_streams=2)
        self._run_pod(pod, [_clip(n=3), _clip(n=3)])
        before = pod.snapshot_carry()
        assert np.abs(before.phases[1]).sum() > 0    # slot 1 has state
        pod.replace_source(1, iter(()), reset_carry=True)
        pod._apply_pending_sources()
        carry = pod.snapshot_carry()
        ref = init_carry(pod.cfg)
        for field in type(ref)._fields:
            np.testing.assert_array_equal(
                getattr(carry, field)[1], np.asarray(getattr(ref, field)),
                err_msg=field)
        # slot 0 untouched
        np.testing.assert_array_equal(carry.phases[0], before.phases[0])
        pod.stop()


class TestOrthoModesCLI:
    def test_stream_cli_model_flag(self, tmp_path):
        frames = (np.asarray(_clip(n=4, color=(0.2, 0.9, 0.2)))
                  * 255).astype(np.uint8)
        env = dict(os.environ, VAUDIO_PLATFORM="cpu", JAX_PLATFORMS="cpu",
                   JAX_COMPILATION_CACHE_DIR="/tmp/vaudio_test_jax_cache",
                   PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH",
                                                             ""))
        r = subprocess.run(
            [sys.executable, "-m", "vaudio", "stream", "--size", "64x64",
             "--model", "orthomodes"],
            input=frames.tobytes(), capture_output=True, env=env,
            cwd="/root/repo", timeout=300)
        assert r.returncode == 0, r.stderr.decode()[-500:]
        pcm = np.frombuffer(r.stdout, "<f4")
        assert len(pcm) >= 4 * 2048 and np.all(np.isfinite(pcm))

    def test_stream_cli_rejects_yuv_and_live_debug(self):
        from vaudio.cli import main
        with pytest.raises(SystemExit, match="RGB-only"):
            main(["stream", "--size", "64x64", "--model", "orthomodes",
                  "--pix-fmt", "i420"])
        with pytest.raises(SystemExit, match="debug"):
            main(["stream", "--size", "64x64", "--model", "orthomodes",
                  "--live-debug", "/tmp/x"])
