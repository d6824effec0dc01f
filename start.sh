#!/bin/sh
# Operator launcher — Unix twin of the reference's start.bat
# (/root/reference/start.bat: compose up, wait, show status + URLs).
set -e

echo "========================================"
echo "Sistema de Classificação de Imagens (TPU)"
echo "========================================"
echo

echo "Iniciando serviços com Docker..."
docker-compose up -d

echo
echo "Aguardando serviços iniciarem..."
sleep 10

echo
echo "Verificando status dos serviços..."
docker-compose ps

echo
echo "========================================"
echo "Sistema iniciado com sucesso!"
echo "========================================"
echo
echo "Acesse:"
echo "- API: http://localhost:8000"
echo "- Documentação: http://localhost:8000/docs"
echo "- Health Check: http://localhost:8000/health"
echo "- Métricas: http://localhost:8000/monitor/metrics"
echo
echo "Para ver logs: docker-compose logs -f"
echo "Para parar: docker-compose down"
