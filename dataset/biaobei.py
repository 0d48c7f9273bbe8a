"""Write BZNSYP.txt: one absolute path per BiaoBei wav
(reference dataset/biaobei.py:1-7)."""
import os

if __name__ == "__main__":
    root = os.path.join("BZNSYP", "Wave")
    with open("BZNSYP.txt", "w", encoding="utf-8") as f:
        for filename in os.listdir(root):
            f.write(os.path.abspath(os.path.join(root, filename)) + "\n")
