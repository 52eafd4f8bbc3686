"""Gradio web UI: upload a video, extract faces, download a zip.

Feature parity with the reference's standalone app (app.py:12-207): style
selector, video-step / min-score / min-size / hash-thr controls, live log
streaming while the CLI runs as a subprocess, zipped ``faces/`` download.
Gradio is optional — the module prints instructions if it is missing.
"""

import os
import os.path as osp
import subprocess
import sys
import tempfile
import zipfile


def process_video(video_path, style, video_step, det_min_score, det_min_size, hash_thr):
    """Run the CLI on the uploaded file, streaming stdout; yields (log, zip)."""
    if not video_path:
        yield "Please upload a video first.", None
        return
    out_dir = tempfile.mkdtemp(prefix="v2f_")
    cmd = [sys.executable, "-m", "videotofaces_tpu",
           "-i", video_path, "-o", out_dir, "-s", style, "-m", "detection",
           "--video-step", str(video_step), "--det-min-score", str(det_min_score),
           "--det-min-size", str(int(det_min_size)), "--hash-thr", str(int(hash_thr))]
    log = "$ " + " ".join(cmd) + "\n"
    yield log, None
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True, bufsize=1)
    for line in proc.stdout:
        log += line
        yield log, None
    proc.wait()

    faces_dir = osp.join(out_dir, "faces")
    files = sorted(os.listdir(faces_dir)) if osp.isdir(faces_dir) else []
    if not files:
        yield log + "\nNo faces found.", None
        return
    zip_path = osp.join(out_dir, "faces.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for fn in files:
            zf.write(osp.join(faces_dir, fn), fn)
    yield log + f"\n{len(files)} faces zipped.", zip_path


def build_demo():
    import gradio as gr

    with gr.Blocks(title="video-to-faces (TPU)") as demo:
        gr.Markdown("# video-to-faces (TPU)\nExtract face crops from a video.")
        with gr.Row():
            with gr.Column():
                video = gr.Video(label="Video")
                style = gr.Radio(["live", "anime"], value="live", label="Style")
                step = gr.Slider(0.25, 10, value=1, step=0.25, label="Seconds between frames")
                score = gr.Slider(0.1, 0.95, value=0.4, step=0.05, label="Min detection score")
                size = gr.Slider(10, 200, value=50, step=10, label="Min face size (px)")
                hthr = gr.Slider(-1, 16, value=8, step=1, label="Duplicate hash threshold")
                run = gr.Button("Extract faces", variant="primary")
            with gr.Column():
                log = gr.Textbox(label="Log", lines=20)
                out = gr.File(label="faces.zip")
        run.click(process_video, [video, style, step, score, size, hthr], [log, out])
    return demo


if __name__ == "__main__":
    try:
        demo = build_demo()
    except ImportError:
        raise SystemExit("gradio is not installed in this environment; "
                         "use `python -m videotofaces_tpu` directly instead")
    demo.queue().launch()
