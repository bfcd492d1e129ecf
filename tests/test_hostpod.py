"""MultiHostPod — the serving pod whose slots span processes.

Single-process tests run the identical code path on the 8-virtual-device
CPU mesh (make_array_from_process_local_data degrades to local placement);
TestTwoProcess runs the REAL multi-process path: two OS processes with 2
CPU devices each, joined through jax.distributed + Gloo collectives,
serving one 4-slot global pod in lockstep.
"""

import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from vaudio.config import AuralizerConfig, LiveParams
from vaudio.io import solid_color_frames
from vaudio.parallel import MultiHostPod, make_stream_mesh
from vaudio.runtime import MultiStreamAuralizer, run_offline
from vaudio.runtime.chunked import run_offline_batched

HOP = 2048
COLORS = [
    [0.9, 0.2, 0.1],
    [0.1, 0.8, 0.3],
    [0.2, 0.3, 0.9],
    [0.8, 0.8, 0.1],
]


def clips(n_streams, n_frames, size=64, width=None):
    return [np.asarray(solid_color_frames(COLORS[s % len(COLORS)],
                                          width=width or size,
                                          height=size,
                                          num_frames=n_frames))
            for s in range(n_streams)]


def wait_done(pod, timeout=120.0):
    t0 = time.monotonic()
    while pod.is_running:
        if time.monotonic() - t0 > timeout:
            pod.stop()
            raise TimeoutError("pod producer still running")
        time.sleep(0.005)
    pod.raise_if_failed()


def tmpl(size=64):
    return np.zeros((size, size, 3), np.float32)


def mesh(n_stream, n_cell=1):
    import jax
    return make_stream_mesh(n_stream, n_cell,
                            devices=jax.devices()[:n_stream * n_cell])


class TestSingleProcess:
    """The multi-host code path on the virtual CPU mesh (one process
    owning every mesh row — local_slice covers all slots)."""

    def test_per_frame_matches_offline(self):
        cfg = AuralizerConfig()
        srcs = clips(4, 6)
        pod = MultiHostPod(cfg, 4, frame=tmpl(),
                           mesh=mesh(4, 1))
        assert pod.local_slice == slice(0, 4)
        pod.start([iter(c) for c in srcs])
        wait_done(pod)
        for s in range(4):
            ref, _, _ = run_offline(srcs[s], cfg)
            np.testing.assert_allclose(pod.pull(s, 6 * HOP),
                                       np.asarray(ref), atol=2e-4)
        pod.stop()

    def test_chunked_matches_offline_batched(self):
        cfg = AuralizerConfig()
        srcs = clips(2, 6)
        pod = MultiHostPod(cfg, 2, frame=tmpl(), chunk_frames=3,
                           mesh=mesh(2, 1))
        pod.start([iter(c) for c in srcs])
        wait_done(pod)
        for s in range(2):
            ref, _, _ = run_offline_batched(srcs[s], cfg, chunk=3)
            np.testing.assert_allclose(pod.pull(s, 6 * HOP),
                                       np.asarray(ref), atol=2e-4)
        pod.stop()

    def test_per_slot_params_are_sharded_with_streams(self):
        """Per-slot LiveParams survive the mesh distribution (the
        single-host mesh pod requires ONE shared object; the hostpod
        shards params over 'stream' like the frames): slot 1's
        stereo_width=0 collapses ITS image only."""
        cfg = AuralizerConfig(channels=2)
        clip = clips(1, 4)[0]
        params = [LiveParams(), LiveParams(stereo_width=0.0)]
        pod = MultiHostPod(cfg, 2, frame=tmpl(), params=params,
                           mesh=mesh(2, 1))
        pod.start([iter(clip), iter(clip.copy())])
        wait_done(pod)
        wide = pod.pull(0, 4 * HOP * 2).reshape(-1, 2)
        mono = pod.pull(1, 4 * HOP * 2).reshape(-1, 2)
        np.testing.assert_allclose(mono[:, 0], mono[:, 1], atol=1e-6)
        assert np.max(np.abs(wide[:, 0] - wide[:, 1])) > 1e-4
        pod.stop()

    def test_uneven_lengths_dark_slot(self):
        """Dark slots ride lockstep ticks as masked black frames; rings
        receive only real hops and the pod exits when every source is
        done (the collective exhaustion check)."""
        cfg = AuralizerConfig()
        long_clip, short_clip = clips(2, 6)
        short_clip = short_clip[:3]
        pod = MultiHostPod(cfg, 2, frame=tmpl(),
                           mesh=mesh(2, 1))
        pod.start([iter(long_clip), iter(short_clip)])
        wait_done(pod)
        assert pod.stream_metrics(0)["buffer_fill"] == 6
        assert pod.stream_metrics(1)["buffer_fill"] == 3
        ref, _, _ = run_offline(long_clip, cfg)
        np.testing.assert_allclose(pod.pull(0, 6 * HOP),
                                   np.asarray(ref), atol=2e-4)
        pod.stop()

    def test_orthomodes_engine(self):
        """The second model family on the multi-host path: frame-sized
        carries initialize eagerly from the template, equality vs the
        single-chip pod."""
        from vaudio.runtime.engine import OrthoModesEngine
        cfg = AuralizerConfig()
        clip = clips(1, 4, size=32)[0]
        ref_pod = MultiStreamAuralizer(
            AuralizerConfig(), n_streams=1,
            engine=OrthoModesEngine(AuralizerConfig()))
        ref_pod.start([iter(clip)])
        wait_done(ref_pod)
        ref = ref_pod.pull(0, 4 * HOP)
        ref_pod.stop()

        pod = MultiHostPod(cfg, 2, frame=tmpl(32),
                           mesh=mesh(2, 1),
                           engine=OrthoModesEngine(cfg))
        pod.start([iter(clip.copy()), iter(clip.copy())])
        wait_done(pod)
        np.testing.assert_allclose(pod.pull(0, 4 * HOP), ref, atol=2e-4)
        pod.stop()

    def test_checkpoint_local_slice(self):
        """snapshot_carry returns THIS host's rows (n_local leading);
        save/load round-trips through the per-host file."""
        cfg = AuralizerConfig()
        srcs = clips(2, 3)
        pod = MultiHostPod(cfg, 2, frame=tmpl(),
                           mesh=mesh(2, 1))
        pod.start([iter(c) for c in srcs])
        wait_done(pod)
        snap = pod.snapshot_carry()
        assert snap.hues.shape[0] == 2
        import tempfile
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "state.npz")
            pod.save_state(path)
            pod.load_state(path)
            snap2 = pod.snapshot_carry()
        np.testing.assert_array_equal(np.asarray(snap.hues),
                                      np.asarray(snap2.hues))
        pod.stop()

    def test_static_capacity(self):
        """resize is refused; acquire_slot leases free local slots but
        never grows past them."""
        cfg = AuralizerConfig()
        pod = MultiHostPod(cfg, 2, frame=tmpl(),
                           mesh=mesh(2, 1),
                           exit_when_exhausted=False, realtime=True)
        with pytest.raises(RuntimeError, match="static capacity"):
            pod.resize(4)
        pod.start([iter(()), iter(())])
        try:
            t0 = time.monotonic()
            while len(pod.free_slots()) < 2:    # empty sources exhaust
                pod.raise_if_failed()
                assert time.monotonic() - t0 < 120
                time.sleep(0.005)
            s0, _ = pod.acquire_slot()
            s1, _ = pod.acquire_slot()
            assert {s0, s1} == {0, 1}
            with pytest.raises(RuntimeError, match="at capacity"):
                pod.acquire_slot()
        finally:
            pod.stop()

    def test_validates_mesh_and_template(self):
        with pytest.raises(ValueError, match="multiple of the mesh"):
            MultiHostPod(AuralizerConfig(), 3, frame=tmpl(),
                         mesh=mesh(2, 1))
        with pytest.raises(ValueError, match="DP-only"):
            MultiHostPod(AuralizerConfig(), 4, frame=tmpl(),
                         mesh=mesh(4, 2))
        with pytest.raises(ValueError, match="template rejected"):
            MultiHostPod(AuralizerConfig(), 2,
                         frame=np.zeros((64, 64, 4), np.float32),
                         mesh=mesh(2, 1))


class TestTwoProcess:
    """The REAL multi-process path: two OS processes, 2 CPU devices
    each, Gloo collectives, one 4-slot global pod in lockstep.  Each
    process serves and checkpoints only its local half; the parent
    compares every global slot's PCM against a single-process offline
    run."""

    def test_two_process_pod_matches_offline(self, tmp_path):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        driver = os.path.join(os.path.dirname(__file__),
                              "hostpod_driver.py")
        env = dict(os.environ)
        env["PYTHONPATH"] = os.pathsep.join(
            [os.path.dirname(os.path.dirname(driver))]
            + env.get("PYTHONPATH", "").split(os.pathsep))
        procs = [subprocess.Popen(
            [sys.executable, driver, str(pid), "2", str(port),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env) for pid in (0, 1)]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        cfg = AuralizerConfig()
        for g in range(4):
            got = np.load(tmp_path / f"pcm_{g}.npy")
            # Mirrors hostpod_driver.clip(g): 144x192, 6 frames (the
            # hue gate passes there, so each slot's audio is distinct
            # and routing bugs cannot cancel out).
            ref_clip = np.asarray(solid_color_frames(
                COLORS[g], width=192, height=144, num_frames=6))
            ref, _, _ = run_offline_batched(ref_clip, cfg, chunk=2)
            np.testing.assert_allclose(got, np.asarray(ref), atol=2e-4)

    def test_two_process_pod_cli(self, tmp_path):
        """The CLI front door: two `vaudio pod --coordinator ...`
        processes (1 virtual CPU device each) serve one 2-slot global
        pod; each host's slot WAV matches the offline run of its clip.

        144x192 is the smallest solid-color size whose hue histogram
        passes the count>20 gate (convolveFeatures.metal:154,
        VisionEngine.swift:263): the two slots' clips then sonify to
        DIFFERENT audio, so a slot-routing/shard-gather bug cannot pass.
        (At 32x32 the mip-3 cells hold 1 px each, every hue is gated
        invalid, and both colors yield byte-identical PCM.)"""
        import wave

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        u8 = [(c * 255).astype(np.uint8)
              for c in clips(2, 4, size=144, width=192)]
        env = dict(os.environ, VAUDIO_PLATFORM="cpu",
                   VAUDIO_NUM_CPU_DEVICES="1",
                   VAUDIO_CPU_COLLECTIVES="gloo",
                   JAX_COMPILATION_CACHE_DIR="/tmp/vaudio_test_jax_cache",
                   PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH",
                                                             ""))
        procs = []
        for pid in (0, 1):
            clip_path = str(tmp_path / f"c{pid}.npy")
            np.save(clip_path, u8[pid])
            procs.append(subprocess.Popen(
                [sys.executable, "-m", "vaudio", "pod", "--size",
                 "144x192", "--input", clip_path,
                 "-o", str(tmp_path / f"out{pid}"),
                 "--chunk-frames", "2",
                 "--coordinator", f"localhost:{port}",
                 "--num-processes", "2", "--process-id", str(pid)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True, env=env, cwd="/root/repo"))
        outs = []
        for p in procs:
            try:
                outs.append(p.communicate(timeout=600)[0])
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
        for pid, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"proc {pid} failed:\n{out[-1500:]}"
            assert f"global slots {pid}..{pid} served here" in out
        cfg = AuralizerConfig()
        for pid in (0, 1):
            with wave.open(str(tmp_path / f"out{pid}" /
                               "slot0.wav")) as wv:
                assert wv.getnframes() == 4 * HOP
                pcm = np.frombuffer(wv.readframes(4 * HOP),
                                    "<i2").astype(np.float32) / 32767.0
            ref, _, _ = run_offline_batched(u8[pid], cfg, chunk=2)
            # The WAV sink clips to int16 full scale (io/sinks.py
            # write_wav, "float32 PCM in [-1, 1]"): the peak-norm quirk
            # (SoundEngine.swift:233-236) + OLA summation legitimately
            # peaks above 1.0 (the reference hands those floats to the
            # speaker, which clips in hardware) — compare against the
            # clipped oracle, not the raw float one.
            ref = np.clip(np.asarray(ref), -1.0, 1.0)
            np.testing.assert_allclose(pcm, ref, atol=5e-4)
