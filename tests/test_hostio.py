import numpy as np
import cv2

from videotofaces_tpu.hostio.video import (VideoReader, frame_schedule, open_reader,
                                           PrefetchingFrameSource)

from test_pipeline_detection import _write_test_video


def test_frame_schedule_semantics():
    # step = round(fps * video_step); bgn = step; end = length
    idx, step = frame_schedule(300, 30, 1, None)
    assert step == 30 and idx == list(range(30, 300, 30))
    # fragment in minutes
    idx, step = frame_schedule(3600, 30, 1, (0.5, 1.0))
    assert idx[0] == max(30, round(60 * 0.5 * 30)) == 900
    assert idx[-1] < min(3600, round(60 * 1.0 * 30 + 1))
    # sub-second sampling
    idx, step = frame_schedule(100, 30, 0.25, None)
    assert step == 8
    # clamp: never below 1 frame
    idx, step = frame_schedule(100, 10, 0.01, None)
    assert step == 1


def test_video_reader_grab_and_seek(tmp_path):
    # frames encode their index in channel 0 so we can verify which frame we get
    path = str(tmp_path / "idx.avi")
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
    for i in range(60):
        vw.write(np.full((48, 64, 3), i * 4, np.uint8))
    vw.release()

    r = VideoReader(path)
    assert r.is_open() and r.length == 60
    # grab path (step <= 50): returns exactly frame i
    batch = r.read_batch([10, 20], step=10)
    assert batch.shape == (2, 48, 64, 3)
    assert abs(int(batch[0, 0, 0, 0]) - 40) <= 4  # MJPG lossy
    assert abs(int(batch[1, 0, 0, 0]) - 80) <= 4
    r.close()

    # seek path (step > 50): the reference reads frame i-1 (kept quirk)
    r = VideoReader(path)
    batch = r.read_batch([55], step=51)
    assert abs(int(batch[0, 0, 0, 0]) - 54 * 4) <= 4
    r.close()


def test_prefetching_source_order_and_area(tmp_path):
    video = str(tmp_path / "clip.avi")
    _write_test_video(video, n_frames=50, fps=10, size=(64, 48))
    reader = open_reader(video)
    indices, step = frame_schedule(reader.length, reader.fps, 1, None)
    src = PrefetchingFrameSource(reader, indices, step, batch_size=2,
                                 video_area=(8, 4, 40, 30))
    got = list(src)
    reader.close()
    assert [bi for bi, _ in got] == [indices[i: i + 2] for i in range(0, len(indices), 2)]
    for _, frames in got:
        assert frames.shape[1:] == (26, 32, 3)  # cropped to the area


def test_prefetching_source_propagates_errors(tmp_path):
    class BoomReader:
        length, fps = 100, 10

        def read_batch(self, idx, step):
            raise RuntimeError("decode boom")

    src = PrefetchingFrameSource(BoomReader(), [10, 20], 10, batch_size=2)
    try:
        list(src)
        raise AssertionError("expected propagated decode error")
    except RuntimeError as e:
        assert "decode boom" in str(e)


def test_parallel_source_matches_single_reader(tmp_path):
    """Segmented parallel decode must yield byte-identical batches in the
    same order as the single prefetching reader."""
    from videotofaces_tpu.hostio import (ParallelFrameSource,
                                         PrefetchingFrameSource, open_reader)
    from videotofaces_tpu.hostio.video import frame_schedule
    from test_pipeline_detection import _write_test_video

    video = str(tmp_path / "clip.avi")
    _write_test_video(video, n_frames=60, fps=10, size=(160, 120))
    reader = open_reader(video)
    indices, step = frame_schedule(reader.length, reader.fps, 0.3, None)
    single = list(PrefetchingFrameSource(reader, indices, step, 4))
    reader.close()
    for workers in (2, 3):
        par = list(ParallelFrameSource(video, indices, step, 4, workers=workers))
        assert [bi for bi, _ in par] == [bi for bi, _ in single]
        for (_, fp), (_, fs) in zip(par, single):
            np.testing.assert_array_equal(fp, fs)


def test_parallel_source_seek_mode(tmp_path):
    """Large steps use the seek strategy; parallel segments must agree."""
    from videotofaces_tpu.hostio import ParallelFrameSource, PrefetchingFrameSource, open_reader
    from videotofaces_tpu.hostio.video import frame_schedule
    from test_pipeline_detection import _write_test_video

    video = str(tmp_path / "clip.avi")
    _write_test_video(video, n_frames=400, fps=10, size=(64, 48))
    reader = open_reader(video)
    indices, step = frame_schedule(reader.length, reader.fps, 6, None)  # step 60 > 50
    assert step > 50
    single = list(PrefetchingFrameSource(reader, indices, step, 2))
    reader.close()
    par = list(ParallelFrameSource(video, indices, step, 2, workers=3))
    assert [bi for bi, _ in par] == [bi for bi, _ in single]
    for (_, fp), (_, fs) in zip(par, single):
        np.testing.assert_array_equal(fp, fs)
