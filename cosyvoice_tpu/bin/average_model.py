"""Average best-N checkpoints by CV loss (replaces bin/average_model.py:44-93)."""

import argparse

from cosyvoice_tpu.train.executor import average_checkpoints, select_best_checkpoints


def main():
    from cosyvoice_tpu.utils.devices import honor_env_platforms

    honor_env_platforms()
    parser = argparse.ArgumentParser()
    parser.add_argument("--src_dir", required=True)
    parser.add_argument("--model_name", default="llm")
    parser.add_argument("--num", type=int, default=5)
    parser.add_argument("--dst_model", required=True)
    args = parser.parse_args()

    import flax.serialization as ser

    paths = select_best_checkpoints(args.src_dir, args.model_name, args.num)
    assert paths, f"no checkpoints with cv_loss sidecars in {args.src_dir}"
    with open(paths[0], "rb") as f:
        template = ser.msgpack_restore(f.read())
    avg = average_checkpoints(paths, template)
    if isinstance(avg, dict) and set(avg.keys()) == {"generator", "discriminator"}:
        # GAN checkpoint: keep only the generator — that's what the runtime
        # loads as hift.msgpack (the discriminator is training-only)
        avg = avg["generator"]
    with open(args.dst_model, "wb") as f:
        f.write(ser.to_bytes(avg))
    print(f"averaged {len(paths)} checkpoints -> {args.dst_model}")


if __name__ == "__main__":
    main()
