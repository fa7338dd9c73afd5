"""Gradio web UI (behavioral port of the reference webui.py:50-174).

Four inference modes, stream toggle, speed, seed. Gradio is not baked into
this image; the module degrades to a clear message when absent.
"""

import argparse

import numpy as np

MODES = ["预训练音色 (sft)", "3s极速复刻 (zero_shot)", "跨语种复刻 (cross_lingual)", "自然语言控制 (instruct)"]


def build_demo(model):
    import gradio as gr

    sr = model.sample_rate

    def generate(tts_text, mode, prompt_text, prompt_wav, instruct_text, spk_id, stream, speed, seed):
        rng = np.random.default_rng(seed)
        if prompt_wav is not None:
            wav_sr, wav = prompt_wav
            wav = (wav.astype(np.float32) / 32768.0)[None, :]
        else:
            wav = None
        if mode == MODES[0]:
            gen = model.inference_sft(tts_text, spk_id, stream=stream, speed=speed)
        elif mode == MODES[1]:
            gen = model.inference_zero_shot(tts_text, prompt_text, wav, stream=stream, speed=speed)
        elif mode == MODES[2]:
            gen = model.inference_cross_lingual(tts_text, wav, stream=stream, speed=speed)
        else:
            gen = model.inference_instruct2(tts_text, instruct_text, wav, stream=stream, speed=speed)
        for out in gen:
            yield (sr, (out["tts_speech"][0] * 32767).astype(np.int16))

    with gr.Blocks() as demo:
        gr.Markdown("### cosyvoice_tpu demo")
        tts_text = gr.Textbox(label="合成文本", value="Hello, this is a TPU-native synthesis demo.")
        mode = gr.Radio(choices=MODES, value=MODES[1], label="推理模式")
        prompt_text = gr.Textbox(label="prompt文本")
        prompt_wav = gr.Audio(sources=["upload", "microphone"], label="prompt音频 (16kHz+)")
        instruct_text = gr.Textbox(label="instruct文本")
        spk_id = gr.Dropdown(choices=model.list_available_spks() or [""], label="预训练音色")
        stream = gr.Radio(choices=[False, True], value=False, label="流式推理")
        speed = gr.Number(value=1.0, label="语速")
        seed = gr.Number(value=0, label="随机种子")
        audio = gr.Audio(label="合成音频", autoplay=True, streaming=True)
        gr.Button("生成音频").click(
            generate, [tts_text, mode, prompt_text, prompt_wav, instruct_text, spk_id, stream, speed, seed], [audio]
        )
    return demo


def main():
    from cosyvoice_tpu.utils.devices import honor_env_platforms

    honor_env_platforms()
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--model_dir", default="")
    args = parser.parse_args()
    try:
        import gradio  # noqa: F401
    except ImportError:
        raise SystemExit("gradio is not installed in this image; use serving/http_server.py or serving/grpc_server.py")
    from cosyvoice_tpu.runtime.api import AutoModel

    model = AutoModel(args.model_dir)
    build_demo(model).queue().launch(server_name="0.0.0.0", server_port=args.port)


if __name__ == "__main__":
    main()
