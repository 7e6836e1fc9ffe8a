"""Interop with the reference's TF1 artifacts: TensorBundle checkpoint
codec, bidirectional weight conversion, and legacy-layout checkpoint
upgrades."""
