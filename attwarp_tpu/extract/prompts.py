"""Conversation-prompt assembly for LLaVA-style MLLMs.

Behavior parity with the reference prompt path (functions.py:56-90 plus the
vendored llava ``conv_templates``): the question is prefixed with the image
token, wrapped in the conversation template inferred from the model name,
with an empty assistant turn appended.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

DEFAULT_IMAGE_TOKEN = "<image>"
DEFAULT_IM_START_TOKEN = "<im_start>"
DEFAULT_IM_END_TOKEN = "<im_end>"
IMAGE_PLACEHOLDER = "<image-placeholder>"

LLAVA_V1_SYSTEM = (
    "A chat between a curious human and an artificial intelligence assistant. "
    "The assistant gives helpful, detailed, and polite answers to the human's "
    "questions."
)


@dataclass(frozen=True)
class ConvTemplate:
    system: str
    role_user: str
    role_assistant: str
    sep: str
    sep2: Optional[str] = None

    def render(self, user_msg: str) -> str:
        """System + one user turn + empty assistant turn."""
        prefix = (self.system + " ") if self.system else ""
        return f"{prefix}{self.role_user}: {user_msg} {self.role_assistant}:"

    @property
    def stop_str(self) -> str:
        return self.sep2 if self.sep2 is not None else self.sep


CONV_TEMPLATES = {
    "llava_v1": ConvTemplate(
        system=LLAVA_V1_SYSTEM,
        role_user="USER",
        role_assistant="ASSISTANT",
        sep=" ",
        sep2="</s>",
    ),
    "llava_v0": ConvTemplate(
        system=LLAVA_V1_SYSTEM,
        role_user="Human",
        role_assistant="Assistant",
        sep="###",
    ),
    "plain": ConvTemplate(system="", role_user="USER", role_assistant="ASSISTANT", sep="\n"),
}


def infer_conv_mode(model_name: str) -> str:
    """Model-name -> conversation mode (functions.py:69-76)."""
    name = model_name.lower()
    if "llama-2" in name:
        return "llava_llama_2"
    if "v1" in name:
        return "llava_v1"
    if "mpt" in name:
        return "mpt"
    return "llava_v0"


def build_prompt(
    question: str,
    conv_mode: str = "llava_v1",
    mm_use_im_start_end: bool = False,
) -> str:
    """Insert the image token and render the conversation
    (functions.py:56-90)."""
    image_token_se = DEFAULT_IM_START_TOKEN + DEFAULT_IMAGE_TOKEN + DEFAULT_IM_END_TOKEN
    qs = question
    if IMAGE_PLACEHOLDER in qs:
        token = image_token_se if mm_use_im_start_end else DEFAULT_IMAGE_TOKEN
        qs = qs.replace(IMAGE_PLACEHOLDER, token)
    else:
        token = image_token_se if mm_use_im_start_end else DEFAULT_IMAGE_TOKEN
        qs = token + "\n" + qs
    tmpl = CONV_TEMPLATES.get(conv_mode, CONV_TEMPLATES["llava_v1"])
    return tmpl.render(qs)


def stop_str_for(conv_mode: str) -> str:
    return CONV_TEMPLATES.get(conv_mode, CONV_TEMPLATES["llava_v1"]).stop_str
