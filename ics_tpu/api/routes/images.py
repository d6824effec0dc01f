"""Public hash-lookup route (reference: ``app/api/routes/images.py``).

Uploads are hashed with the same SHA-256 content identity the sync engine
uses and looked up by primary key; the bytes are discarded.
"""

from __future__ import annotations

from ics_tpu.core.security import sha256_hex
from ics_tpu.db.models import Imagem
from ics_tpu.web import HTTPException, JSONResponse, Request, Router

router = Router(prefix="/images")


@router.post("/buscar-por-hash")
async def buscar_imagens_por_hash(request: Request):
    db = request.state.db
    form = await request.form()
    files = [f for _, f in form.files]
    if not files:
        raise HTTPException(
            400, "Nenhuma imagem foi enviada. Envie pelo menos uma imagem."
        )
    resultados = []
    total_encontradas = 0
    for f in files:
        if not f.content_type.startswith("image/"):
            resultados.append({"hash": "", "encontrada": False, "imagem": None})
            continue
        content_hash = sha256_hex(f.data)
        imagem = db.get(Imagem, content_hash)
        if imagem is not None:
            total_encontradas += 1
            resultados.append(
                {
                    "hash": content_hash,
                    "encontrada": True,
                    "imagem": {
                        "content_hash": imagem.content_hash,
                        "nome_img": imagem.nome_img,
                        "caminho_img": imagem.caminho_img,
                    },
                }
            )
        else:
            resultados.append(
                {"hash": content_hash, "encontrada": False, "imagem": None}
            )
    return JSONResponse(
        {
            "total_enviadas": len(files),
            "total_encontradas": total_encontradas,
            "resultados": resultados,
        }
    )
