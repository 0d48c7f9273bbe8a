"""Write basismelgan.txt: one absolute path per generated Basis-MelGAN wav
(reference dataset/basismelgan.py:1-6)."""
import os

if __name__ == "__main__":
    root = os.path.join("Basis-MelGAN-dataset", "generated")
    with open("basismelgan.txt", "w", encoding="utf-8") as f:
        for filename in os.listdir(root):
            f.write(os.path.abspath(os.path.join(root, filename)) + "\n")
