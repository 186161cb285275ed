"""CLI commands mirroring the reference's two entry points:

mash-style:  sketch dist triangle screen taxscreen contain paste info
             bounds find   (mash.cpp:21-39)
lyn2vec-style: generate fingerprint mapping   (lyn2vec.py:241-287)
"""
