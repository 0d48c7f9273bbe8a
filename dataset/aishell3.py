"""Write aishell3.txt: one absolute path per AISHELL-3 train wav, walking
the nested speaker dirs (reference dataset/aishell3.py:1-7)."""
import os

if __name__ == "__main__":
    root = os.path.join("aishell3", "train", "wav")
    with open("aishell3.txt", "w", encoding="utf-8") as f:
        for speaker in os.listdir(root):
            spk_dir = os.path.join(root, speaker)
            for filename in os.listdir(spk_dir):
                f.write(os.path.abspath(os.path.join(spk_dir, filename)) + "\n")
