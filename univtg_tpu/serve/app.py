"""Interactive demo app (gradio Blocks), mirroring the reference's
main_gradio.py flow: upload/extract a video -> type a query -> grounded
Top-1 interval + Top-5 windows + Top-1 highlight.

gradio is an optional dependency; `launch_app` raises a clear error when it
is absent. The compute path is exactly the serving pipeline (one jitted
grounding core shared with batch eval).
"""
from __future__ import annotations

from typing import Optional


def launch_app(pipeline, server_port: int = 7860, share: bool = False,
               example_video: Optional[str] = None):
    """pipeline: univtg_tpu.serve.GroundingPipeline with a clip_encoder."""
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "gradio is not installed; use `python -m univtg_tpu.cli ground` "
            "for the CLI demo path"
        ) from e

    import numpy as np

    from univtg_tpu.extract.pipeline import vid2clip

    state = {"features": None, "video": None}

    def extract(video_path):
        if not video_path:
            return "Upload a video first."
        state["features"] = vid2clip(
            pipeline.clip_encoder, video_path, clip_len=pipeline.clip_len
        )
        state["video"] = video_path
        n = len(state["features"])
        return f"Extracted {n} clip features ({n * pipeline.clip_len:.0f}s video)."

    def ground(query):
        if state["features"] is None:
            return "Extract a video first."
        from univtg_tpu.extract.pipeline import txt2clip

        txt = txt2clip(pipeline.clip_encoder, query)
        result = pipeline.ground_features(state["features"], txt)
        lines = [pipeline.describe(result, query), "", "Top-5 windows:"]
        for st, ed, sc in result["topk_windows"]:
            lines.append(f"  [{st:8.2f}s, {ed:8.2f}s]  conf {sc:.3f}")
        return "\n".join(lines)

    with gr.Blocks(title="univtg_tpu grounding demo") as demo:
        gr.Markdown("## Video-language temporal grounding (TPU)")
        with gr.Row():
            video = gr.Video(label="video", value=example_video)
            with gr.Column():
                extract_btn = gr.Button("Extract features")
                status = gr.Textbox(label="status", interactive=False)
                query = gr.Textbox(label="query")
                ground_btn = gr.Button("Ground")
                answer = gr.Textbox(label="result", interactive=False, lines=10)
        extract_btn.click(extract, inputs=video, outputs=status)
        ground_btn.click(ground, inputs=query, outputs=answer)
    demo.launch(server_port=server_port, share=share)
