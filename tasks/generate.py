#!/usr/bin/env python
"""Regenerate the task-grid launchers (families x trim x injection x
causal), the equivalent of the reference's 76-script grid under tasks/."""
import os
import stat

families = {
    "none": ("train_librispeechmix_none.py", "conformer-t_none.yaml", []),
    "scratch": ("train_librispeechmix_scratch.py",
                "conformer-t_scratch.yaml",
                ["sum", "prod", "cat", "cross_attention"]),
    "wavlm": ("train_librispeechmix_pretrained.py",
              "conformer-t_wavlm.yaml",
              ["sum", "prod", "cat", "cross_attention"]),
}
inj_name = {"sum": "Sum", "prod": "Prod", "cat": "Cat",
            "cross_attention": "Attn"}
trims = {None: "TrimNonTargetNone", 0: "TrimNonTarget0s",
         4: "TrimNonTarget4s", 8: "TrimNonTarget8s",
         32: "TrimNonTarget32s"}


def main():
    root = os.path.dirname(os.path.abspath(__file__))
    count = 0
    for fam, (script, yaml_file, injections) in families.items():
        for trim, trim_name in trims.items():
            for causal in (False, True):
                for inj in (injections or [None]):
                    parts = [trim_name]
                    if inj:
                        parts.append(inj_name[inj])
                    if causal:
                        parts.append("Causal")
                    name = "_".join(parts) + ".sh"
                    outdir = os.path.join(root, fam)
                    os.makedirs(outdir, exist_ok=True)
                    overrides = []
                    if trim is not None:
                        overrides.append(f"--trim_nontarget {trim}")
                    if inj:
                        overrides.append(f"--injection_mode {inj}")
                    if causal:
                        overrides.append(
                            "--causal_encoder true "
                            "--frontend_padding causal")
                    exp = "/".join(p for p in [
                        "LibriSpeechMix", fam, trim_name,
                        inj_name.get(inj, ""),
                        "Causal" if causal else ""] if p)
                    lines = [
                        "#!/bin/bash",
                        "# Auto-generated task launcher "
                        "(see tasks/generate.py)",
                        'source "$(dirname "$0")/../config.sh"',
                        "",
                        f"python {script} "
                        f"hparams/LibriSpeechMix/{yaml_file} \\",
                        '    --data_folder "$DATA_FOLDER" \\',
                        '    --num_epochs "$NUM_EPOCHS" \\',
                        f"    --experiment_name {exp} \\",
                    ]
                    for ov in overrides:
                        lines.append(f"    {ov} \\")
                    lines.append("    $EXTRA_ARGS")
                    path = os.path.join(outdir, name)
                    with open(path, "w") as f:
                        f.write("\n".join(lines) + "\n")
                    os.chmod(path, os.stat(path).st_mode | stat.S_IEXEC)
                    count += 1
    print(f"generated {count} launchers")


if __name__ == "__main__":
    main()
