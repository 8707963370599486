"""Alpaca-family prompt templates + Prompter formatter.

Equivalent of the reference's template side-utilities
(/root/reference/MedTok_QA_Tutorial/utils/prompter.py:10-51 and
templates/*.json). Templates are embedded (no template files to ship) but
custom template dicts/files are accepted.
"""

from __future__ import annotations

import json
from pathlib import Path

TEMPLATES: dict[str, dict] = {
    "alpaca": {
        "description": "Template used by Alpaca-LoRA.",
        "prompt_input": (
            "Below is an instruction that describes a task, paired with an "
            "input that provides further context. Write a response that "
            "appropriately completes the request.\n\n### Instruction:\n"
            "{instruction}\n\n### Input:\n{input}\n\n### Response:\n"
        ),
        "prompt_no_input": (
            "Below is an instruction that describes a task. Write a response "
            "that appropriately completes the request.\n\n### Instruction:\n"
            "{instruction}\n\n### Response:\n"
        ),
        "response_split": "### Response:",
    },
    "alpaca_short": {
        "description": "A shorter template to experiment with.",
        "prompt_input": (
            "### Instruction:\n{instruction}\n\n### Input:\n{input}\n\n"
            "### Response:\n"
        ),
        "prompt_no_input": "### Instruction:\n{instruction}\n\n### Response:\n",
        "response_split": "### Response:",
    },
}


class Prompter:
    def __init__(self, template: str | dict | Path = "alpaca", verbose: bool = False):
        self._verbose = verbose
        if isinstance(template, dict):
            self.template = template
        elif isinstance(template, Path) or (
            isinstance(template, str) and template.endswith(".json")
        ):
            self.template = json.loads(Path(template).read_text())
        else:
            name = template or "alpaca"
            if name not in TEMPLATES:
                raise ValueError(f"Can't read template {name}")
            self.template = TEMPLATES[name]

    def generate_prompt(
        self, instruction: str, input: str | None = None, label: str | None = None
    ) -> str:
        if input:
            res = self.template["prompt_input"].format(
                instruction=instruction, input=input
            )
        else:
            res = self.template["prompt_no_input"].format(instruction=instruction)
        if label:
            res = f"{res}{label}"
        if self._verbose:
            print(res)
        return res

    def get_response(self, output: str) -> str:
        return output.split(self.template["response_split"])[1].strip()
